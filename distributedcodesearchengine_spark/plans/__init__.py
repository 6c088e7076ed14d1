from .audit import explain_str, assert_plan

__all__ = ["explain_str", "assert_plan"]
