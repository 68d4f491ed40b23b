from sievedata.pipelines.profile import build_profiles, load_profiles
from sievedata.pipelines.score import score_documents
from sievedata.pipelines.validate import validate_documents

__all__ = ["build_profiles", "load_profiles", "validate_documents", "score_documents"]
