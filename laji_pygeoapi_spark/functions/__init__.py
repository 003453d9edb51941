"""Column-expression builders and pandas-UDF wrappers (the engine's scalar
function surface, SURVEY.md §2.8-2.9)."""
