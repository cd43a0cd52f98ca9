"""Two-sided per-key custom operators: ``cogroup().applyInPandas`` and
``mapInArrow`` tiers.

The reference's reduce phase hands ONE grouped bag to user code
(``MapReduceFramework.cpp:224-239`` — a single IntermediateVec per
key); expressing a TWO-table per-key computation there requires the
tag-union trick (tag each source in map, split the bag in reduce —
Dean & Ghemawat §4's reduce-side join).  Spark's native form of that
contract is ``DataFrame.groupBy().cogroup()``: each key yields the
key's rows from BOTH tables, already split, as two pandas frames.

``cogroup_asof`` implements as-of matching on that tier so all THREE
custom-operator tiers of the same semantics exist side by side and are
tested for identical results:

- q70: single-window JVM plan (tag-union + last-ignorenulls) — the
  scale path;
- q124: one vectorized ``merge_asof`` per PARTITION via
  ``repartition + mapInPandas``;
- here: one ``merge_asof`` per KEY GROUP via cogroup — the form to
  reach for when the two sides have heterogeneous schemas that cannot
  tag-union into one table.

Scale notes: cogroup shuffles BOTH tables on the key (two exchanges
into one FlatMapCoGroupsInPandas); per-key Python overhead makes it the
slowest tier (q124's docstring carries the 6x measurement), so the
declared queries use the JVM/partition tiers and this module exists for
API-surface parity with semantics joins can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cogroup_asof(
    purchases: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """As-of match each purchase row to the same key's most recent
    strictly-prior click via ``cogroup().applyInPandas``.

    Returns (event_id, user_id, gap_us double) — raw microseconds so
    the caller applies the same rounding rule as q70/q124.
    """

    def match(left, right):
        import pandas as pd

        # a key present on only one side delivers the other side as an
        # EMPTY frame — guard before column selection
        if len(left) == 0:
            return pd.DataFrame(columns=["event_id", key, "gap_us"])
        p = left[["event_id", key, ts]].sort_values(ts, kind="mergesort")
        c = (
            right[[key, "c_ts"]].sort_values("c_ts", kind="mergesort")
            if len(right)
            else pd.DataFrame(columns=[key, "c_ts"])
        )
        if len(c) == 0:
            out = p.copy()
            out["gap_us"] = float("nan")
            return out[["event_id", key, "gap_us"]]
        m = pd.merge_asof(
            p,
            c,
            left_on=ts,
            right_on="c_ts",
            by=key,
            allow_exact_matches=False,
            direction="backward",
        )
        m["gap_us"] = (m[ts] - m["c_ts"]).dt.total_seconds() * 1e6
        return m[["event_id", key, "gap_us"]]

    # both sides often derive from ONE scan (self-cogroup); identical
    # attribute ids are de-duplicated by the analyzer and the right
    # side's duplicates get PRUNED — rename the right's timestamp so it
    # is a distinct attribute and survives
    clicks_r = clicks.select(key, clicks[ts].alias("c_ts"))
    return (
        purchases.groupBy(key)
        .cogroup(clicks_r.groupBy(key))
        .applyInPandas(match, schema=f"event_id bigint, {key} bigint, gap_us double")
    )


def arrow_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row token counts computed with ``mapInArrow`` — the
    lowest-overhead Python kernel tier: batches stay as Arrow
    RecordBatches end to end (no pandas materialization), and the
    counting runs in pyarrow.compute's C++ kernels.

    Returns (doc_id, n_tokens int) — identical to the JVM expression
    ``size(split(text, ' '))`` (parity-tested); exists to pin the
    mapInArrow surface for kernels where Arrow-native compute (or a
    zero-copy hand-off to numpy/C extensions) beats the
    Arrow->pandas->Arrow round-trip of mapInPandas.
    """

    def count(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            toks = pc.split_pattern(batch.column(text_col), " ")
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.cast(pc.list_value_length(toks), pa.int32())],
                names=["doc_id", "n_tokens"],
            )

    return docs.select("doc_id", text_col).mapInArrow(
        count, schema="doc_id bigint, n_tokens int"
    )
