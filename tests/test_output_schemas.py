"""Driver-contract guard: every registered query's output schema must
be ATOMIC (no array/map/struct columns).

The driver's correctness harness canonicalizes each result with
pandas ``sort_values`` before hashing; list-valued cells are
unhashable there, so an array-typed output column crashes the sweep
row (round 4: ``emb_pca_project`` returned ``proj_r6
array<double>``, recorded ``err`` with a null row count, and —
because a null row count is non-terminal — would have re-fronted
into every future sweep). This test closes the CLASS: any query
that wants to expose a vector posexplodes it to (id, dim, value)
scalars or serializes it to one string column.

Constructing a plan is enough to read its schema — no result
collection — but a handful of queries legitimately run driver-side
fits at plan-build time (PCA eigh, BPE merge loop, IVF centroids),
so this sweeps at sf0.001 where those cost milliseconds.
"""

from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"

_NESTED = (T.ArrayType, T.MapType, T.StructType)


def test_every_query_output_schema_is_atomic(spark):
    from sfdata_wrangler_spark.plans.catalog import QUERIES

    bad: list[str] = []
    for name, spec in QUERIES.items():
        df = spec["fn"](spark, SF)
        for field in df.schema.fields:
            if isinstance(field.dataType, _NESTED):
                bad.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not bad, (
        "array/map/struct output columns crash the driver's pandas "
        f"canonicalizer — posexplode or serialize them: {bad}"
    )
