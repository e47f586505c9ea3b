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
# a bounded window (50 per round), so the window ROTATES each round to
# ops without a driver-stamped green row while still sampling every
# SURVEY §2 family.  Rounds 1-2 certified 98 distinct ops (see
# CORRECTNESS_r01/r02.json); the round-3 window below holds 50
# never-driver-verified names — 49 from the unchecked pool plus
# dedup_near_minhash, whose brand-new hash oracle (round 3) has never
# been driver-exercised.  All 50 carry full DuckDB value-hash oracles.
# Remaining operators follow in registration order.
PRIORITY: tuple[str, ...] = (
    # 2.1 scans/sources/sinks
    "scan_explicit_schema",
    "scan_csv_options",
    "layout_partition_sort",
    "scan_schema_evolution_merge",
    # 2.2 projection/filter
    "project_rename_cast",
    "filter_like",
    "filter_null_semantics",
    # 2.3 joins
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_star_5way",
    "join_range_bucketed",
    # 2.5 window functions
    "win_running_sum",
    "win_moving_avg",
    "win_ntile_pctrank",
    # 2.6 sort/limit/distinct
    "drop_duplicates_subset",
    # 2.7 set operations / sampling
    "set_union_distinct",
    "set_except",
    "sample_topk_hash_per_group",
    # 2.8 scalar functions
    "str_regexp",
    "date_arith",
    "hash_id_stable",
    "array_higher_order",
    "struct_nested",
    # 2.9 streaming
    "stream_sliding_sum",
    # 2.10 UDF surface
    "udf_python_scalar",
    "udf_arrow_batch",
    # 2.11 LLM data pipeline: dedup / similarity / text / multimodal
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "embed_quantize_int8",
    "sim_knn_label_vote",
    "text_quality_score",
    "text_token_count_bpe",
    "text_fingerprint_rolling",
    "text_chunk_sliding",
    "multimodal_decode_ppm",
    # 2.14 time-series rollups
    "agg_cumulative_distinct",
    # 2.15 corpus curation
    "pack_sequences_greedy",
    "vocab_topk_coverage",
    "knn_eval_confusion",
    # composite queries
    "basket_pair_affinity",
    # extras (round-1 additions)
    "pivot_wide",
    "scd2_merge_emulation",
    "agg_corr_regr",
    "lateral_correlated_topk",
    # graph / iterative
    "kmeans_lloyd_int",
    # lifecycle / sessionless analytics
    "streak_longest_daily",
    "win_sliding_distinct_users",
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
