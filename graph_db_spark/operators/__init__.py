"""Operator library: relational breadth + LLM-data-pipeline operators.

Everything here is built from pyspark.sql.functions expressions (JVM-side,
whole-stage-codegen'd); Python/pandas UDFs appear only where built-ins
genuinely can't express the semantics (multimodal decode stubs).
"""
