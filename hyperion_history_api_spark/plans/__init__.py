from .predicates import QueryParams, compile_predicate, apply_query  # noqa: F401
