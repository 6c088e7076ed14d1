from .corpus import generate_pages, generate_rows_local, VOCAB_SIZE
from .tables import load_table, documents_as_pages

__all__ = [
    "generate_pages",
    "generate_rows_local",
    "VOCAB_SIZE",
    "load_table",
    "documents_as_pages",
]
