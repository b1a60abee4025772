"""Pure DataFrame → DataFrame operators.

Every operator is declarative (built-in ``pyspark.sql.functions`` only, no
row-at-a-time Python) so Catalyst can push filters, prune columns, and keep
the whole chain inside whole-stage codegen. Pandas UDFs appear only where
built-ins genuinely can't express the semantics (MinHash banding, multimodal
decode stubs) and are Arrow-batched.
"""
