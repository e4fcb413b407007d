"""Catalog-wide output-schema contract.

The external correctness driver canonicalizes every query result with
pandas ``sort_values`` before hashing; list/dict cells are unhashable
there, so any registered query emitting an ArrayType / MapType /
StructType column errs at the only gate that counts (this is exactly
how ``quantize_embeddings`` shipped red in round 4 — its ``codes
array<int>`` column blew up the driver canonicalizer while every local
test passed).  This test enforces the rule for all registered queries:
serialize nested values (``concat_ws`` / ``array_to_string`` / md5)
before returning.

Schema-only: ``fn(spark, sf)`` builds the lazy plan, no job runs, so
walking all ~190 queries stays in the fast (non-oracle) gate.
"""

from __future__ import annotations

from pyspark.sql import types as T

from ecs_ecommerce_data_pipeline_spark import catalog

SF = "/root/testdata/sf0.001"

_NESTED = (T.ArrayType, T.MapType, T.StructType)


def test_no_nested_output_columns(spark):
    bad: list[str] = []
    for name, fn in catalog.queries().items():
        schema = fn(spark, SF).schema
        for field in schema.fields:
            if isinstance(field.dataType, _NESTED):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "registered queries must not emit nested output columns "
        "(driver canonicalizer sortability contract): " + ", ".join(bad)
    )
