"""Scalar/column function helpers: expr.* evaluators, text, vectors."""
