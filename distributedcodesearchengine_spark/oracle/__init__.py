from .tokenizer import tokenize
from .bm25 import BM25Oracle
from .extract import extract_text

__all__ = ["tokenize", "BM25Oracle", "extract_text"]
