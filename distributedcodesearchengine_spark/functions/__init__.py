from .udfs import tokenize_udf, extract_text_udf, tokenize_expr

__all__ = ["tokenize_udf", "extract_text_udf", "tokenize_expr"]
