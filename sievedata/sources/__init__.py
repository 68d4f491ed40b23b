from sievedata.sources.storage import read_documents, read_table, write_table

__all__ = ["read_documents", "read_table", "write_table"]
