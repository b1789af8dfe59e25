"""Relational and dataflow operators that stock Spark lacks as
one-liners: key-based upsert/merge, deduplication family, similarity
search. All composed from DataFrame primitives so Catalyst plans
them."""
