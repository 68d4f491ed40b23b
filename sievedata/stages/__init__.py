from sievedata.stages.parse import parse_documents_batch, PARSED_COLUMNS

__all__ = ["parse_documents_batch", "PARSED_COLUMNS"]
