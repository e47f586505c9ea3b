"""Operator registry (SURVEY.md §2 — the binding contract).

Every §2 operator registers itself here via the ``@op`` decorator; the
driver-facing ``__spark_entry__.py`` re-exports ``queries()`` and
``oracle_sql()`` from this module.

An operator = (name, query fn, optional DuckDB oracle SQL).  Operators
whose semantics are not SQL-expressible (streaming state, MinHash LSH,
side-effecting sinks, approx sketches) register ``oracle=None`` and get
the driver's weaker rows-only check plus our own property tests
(SURVEY.md §5.2 layer 3).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB 1.0, or None -> rows-only
    category: str  # SURVEY.md §2 subsection, e.g. "2.4 aggregation"


OPS: dict[str, Op] = {}


def op(name: str, oracle: str | None, category: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in OPS:
            raise ValueError(f"duplicate operator name: {name}")
        OPS[name] = Op(name=name, fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for side effect: each module registers its operators.
    from trip_data_pipeline_spark import operators  # noqa: F401


# Verification priority: the driver checks queries() keys in order with
# a bounded window (50 in round 1), so the first keys must sample EVERY
# SURVEY §2 family — scans, filters, each join type, aggregation,
# windows, sort/limit/distinct, set ops, scalar functions, streaming,
# UDFs, the LLM-pipeline families (dedup / similarity / text /
# multimodal), geo, time-series, and lifecycle — rather than whatever
# alphabetical module order yields.  Remaining operators follow in
# registration order.
PRIORITY: tuple[str, ...] = (
    # 2.1 scans/sources/sinks
    "scan_parquet",
    "scan_json_props",
    # 2.2 projection/filter
    "filter_conjunctive",
    "case_when_bucketize",
    "validate_quarantine",
    # 2.3 joins
    "join_inner_equi",
    "join_broadcast_dim",
    "join_theta_band",
    "join_asof_latest",
    # 2.4 aggregation
    "agg_count_distinct",
    "agg_stats",
    # 2.5 window functions
    "win_rank_dense_rownum",
    "win_topk_per_group",
    "win_lag_lead",
    # 2.6 sort/limit/distinct
    "sort_multikey_nulls",
    "limit_topk",
    "distinct_rows",
    # 2.7 set operations / sampling
    "set_union_all",
    "set_intersect",
    "sample_deterministic_hash",
    # 2.8 scalar functions
    "str_basics",
    "date_parts",
    "time_bucket_15min",
    "math_suite",
    "json_extract_props",
    # 2.9 streaming (batch form + true streams)
    "sessionize_batch",
    "stream_tumbling_count",
    "stream_stream_join",
    # 2.10 UDF surface
    "udf_pandas_scalar",
    "udaf_pandas_grouped_agg",
    "udtf_grouped_map_normalize",
    # 2.11 LLM data pipeline: dedup / similarity / text / multimodal
    "dedup_exact_hash",
    "dedup_near_minhash",
    "sim_cosine_pairwise_topk",
    "sim_ann_ivf_bucket",
    "text_tfidf_topk",
    "text_lang_id",
    "pipeline_training_data_prep",
    "multimodal_binary_meta",
    # 2.13 geo trip analytics
    "geo_haversine_trip_distance",
    "geo_grid_cell_density",
    # 2.14 time-series rollups
    "rollup_hypertable_2level",
    "timeseries_gap_fill_locf",
    "dq_outlier_iqr",
    # lifecycle / sessionless analytics
    "interval_merge_overlaps",
    # 2.15 corpus curation (round-2 additions)
    "corpus_boilerplate_ngram_prune",
    "eval_contamination_ngram",
    "text_repetition_metrics",
    "sim_ann_lsh_hyperplane",
    "embed_covariance_int",
)


def _ordered() -> dict[str, Op]:
    _ensure_loaded()
    missing = [n for n in PRIORITY if n not in OPS]
    if missing:  # fail loudly — a typo here would silently skew checks
        raise KeyError(f"PRIORITY names not registered: {missing}")
    out: dict[str, Op] = {n: OPS[n] for n in PRIORITY}
    out.update((n, o) for n, o in OPS.items() if n not in out)
    return out


def queries() -> dict[str, QueryFn]:
    return {name: o.fn for name, o in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: o.oracle for name, o in _ordered().items() if o.oracle is not None}
