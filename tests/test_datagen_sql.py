"""gen_docs emits its span expressions as SQL text (plan-construction
speed); this pins the SQL formulation VALUE-identical to the original
Column formulation, node for node, on both the clean and noisy-surface
paths. A drift in any literal, cast, or branch breaks the row comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from trustfuse_spark.datagen import (
    ATTR_NAMES,
    EPOCH0,
    N_ATTRS,
    N_WRONG,
    REV_GAP_S,
    _SPAN_ARRAY_T,
    _entity_name,
    _mix,
    _noisy_surface,
    _p_true_pct,
    _true_value_idx,
    _value_str,
    _wrong_value_idx,
    gen_docs,
)


def _gen_docs_columns(spark, n_entities, n_sources, n_revs, entity_noise=False):
    """The pre-r6 Column-tree formulation, kept verbatim as the reference."""
    n_rows = n_entities * n_sources * n_revs
    docs = (
        spark.range(0, n_rows, 1, spark.sparkContext.defaultParallelism)
        .withColumn("e", (F.col("id") / (n_sources * n_revs)).cast("long"))
        .withColumn("s", (F.col("id") / n_revs).cast("long") % n_sources)
        .withColumn("r", F.col("id") % n_revs)
    )
    e, s, r = F.col("e"), F.col("s"), F.col("r")
    entity_repr = _noisy_surface(e, s, r) if entity_noise else _entity_name(e)
    span_structs = []
    for a_i in range(N_ATTRS):
        a = F.lit(a_i).cast("long")
        present = ((_mix(e, s, a, 5) % 100) >= 30) & (a % n_revs == r)
        is_true = (_mix(e, s, a, 7) % 100) < _p_true_pct(s)
        tv = _true_value_idx(e, a)
        vidx = F.when(is_true, tv).otherwise(
            _wrong_value_idx(tv, _mix(e, s, a, 11) % N_WRONG)
        )
        text = F.concat(
            entity_repr, F.lit(" | "), F.lit(ATTR_NAMES[a_i]), F.lit(" | "),
            _value_str(e, a, vidx),
        )
        span_structs.append(
            F.when(
                present,
                F.array(
                    F.struct(
                        F.lit("text").alias("kind"),
                        text.alias("text"),
                        F.lit("").alias("media_ref"),
                        F.lit(a_i).cast("int").alias("offset"),
                    )
                ),
            ).otherwise(F.array().cast(_SPAN_ARRAY_T))
        )
    n_media = _mix(e, s, r, 13) % 3
    for m_i in range(2):
        mref = F.concat(
            F.lit("mref://"), (_mix(e, s, r, 29 + m_i) % 100000).cast("string")
        )
        span_structs.append(
            F.when(
                n_media > m_i,
                F.array(
                    F.struct(
                        F.lit("media").alias("kind"),
                        F.lit("").alias("text"),
                        mref.alias("media_ref"),
                        F.lit(N_ATTRS + m_i).cast("int").alias("offset"),
                    )
                ),
            ).otherwise(F.array().cast(_SPAN_ARRAY_T))
        )
    spans = F.concat(*span_structs)
    doc_id = F.concat(
        F.lit("d"), F.lpad(e.cast("string"), 6, "0"),
        F.lit("_"), F.lpad(s.cast("string"), 4, "0"),
        F.lit("_"), F.lpad(r.cast("string"), 2, "0"),
    )
    ts = F.to_timestamp(
        F.from_unixtime(F.lit(EPOCH0) + r * REV_GAP_S + (_mix(e, s, 41) % 3600))
    )
    return (
        docs.select(doc_id.alias("doc_id"), spans.alias("spans"), ts.alias("ts"))
        .filter(F.size("spans") > 0)
    )


def _snap(df):
    return sorted(
        (
            r["doc_id"],
            tuple(
                (sp["kind"], sp["text"], sp["media_ref"], sp["offset"])
                for sp in r["spans"]
            ),
            r["ts"],
        )
        for r in df.collect()
    )


@pytest.mark.parametrize(
    "n_e,n_s,n_r,noise",
    [(40, 7, 3, False), (25, 5, 2, True)],
)
def test_gen_docs_sql_matches_column_formulation(spark, n_e, n_s, n_r, noise):
    new = gen_docs(spark, n_e, n_s, n_r, entity_noise=noise)
    old = _gen_docs_columns(spark, n_e, n_s, n_r, entity_noise=noise)
    assert new.schema == old.schema
    assert _snap(new) == _snap(old)
