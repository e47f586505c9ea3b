"""Whole-registry Spark-vs-DuckDB VALUE parity at a replicated scale
(default the 10x layout) — the at-scale sibling of tests/driver_sim.py.

The driver's correctness gate runs at sf0.01, where magnitude- and
cardinality-dependent defect classes are invisible: the round-7 int64
ppm overflows, for example, only materialize once counts approach
10^9+ and were caught by a hand audit, not a gate.  This sweep
mechanizes that audit: every registered op runs against its DuckDB
oracle ON THE SAME 10x (sf≈1) layout and the full VALUE bag is
compared, not just timings (tools/profile_ops.py) or row counts.

Two comparison modes, chosen per op by output size:

- rows <= PARITY_CAP_ROWS (default 500k): the exact driver-parity
  compare from tests/oracle.py — collect both sides, canonicalize,
  diff the sorted bag.  Identical semantics to the driver's check.
- rows >  cap (per-row transforms over 6M-row facts, the theta-band
  pair explosion, ...): collecting millions of rows into Python
  measures the harness, not the engines, so both ENGINES compute an
  order-insensitive fingerprint over the identical canonical row
  encoding: each column is rendered to a canonical string (exact
  integer/string/date forms; %.6f for pre-rounded doubles — the same
  rendering tests/oracle.py's _canon_val applies), rows are joined
  '|'-wise in sorted-column order, md5'd, and two 56-bit hex chunks
  are parsed back to integers and SUMmed (DECIMAL(38,0) / HUGEINT, no
  overflow below ~10^21 rows).  Equal counts + equal double sums ==
  equal bags up to md5 collisions (~2^-112 per differing pair).
  Cross-engine encoder equality is locked by
  tests/test_parity_fingerprint.py, which runs BOTH modes on small
  fixtures and asserts the fingerprint agrees with the exact compare.

Float sums at 10x magnitudes (1e11+) carry engine-private summation
order, so strict %.6f equality is not meaningful there: on a strict
mismatch, ops with double columns are re-compared at 9 significant
digits (exact path, FLOAT-TOL-OK) or on their integer/string skeleton
(fingerprint path, FP-INT-OK) — always a distinct, visible status.

Usage:
  [PARITY_OPS=a,b,c] [PARITY_RESUME=1] [PARITY_ORACLE_BUDGET=secs] \
      python tools/parity_sweep.py [sf_dir] [out_json]
    sf_dir   default /tmp/scale_probe_x10 (build: tools/scale_probe.py)
    out_json default docs/PARITY_10x.json (written incrementally)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tests.oracle import (
    canon_rows,
    driver_sort_check,
    duck_connect,
    duck_result,
)
from trip_data_pipeline_spark.registry import OPS, queries

CAP = int(os.environ.get("PARITY_CAP_ROWS", "500000"))

# Per-op DuckDB budget: a few oracles are full-algorithm replays whose
# MATERIALIZATION is quadratic at 10x (the minhash-eval truth arm
# DISTINCTs a ~279M-row inverted-index self-join) — the engine under
# test is fine, the oracle is the bottleneck.  Rather than stall the
# whole sweep, interrupt the oracle after the budget and record
# ORACLE-BUDGET-NA; those ops get their at-scale parity at a smaller
# replication where the oracle is tractable — or, since round 9, at
# full 10x via the SCALED_ORACLES overrides below.
ORACLE_BUDGET_S = float(os.environ.get("PARITY_ORACLE_BUDGET", "300"))


class OracleBudgetExceeded(Exception):
    pass


def _with_budget(con, fn):
    import threading

    import duckdb

    timer = threading.Timer(ORACLE_BUDGET_S, con.interrupt)
    timer.start()
    try:
        return fn()
    except duckdb.InterruptException as e:
        raise OracleBudgetExceeded(str(e)) from e
    finally:
        timer.cancel()

# Same premise-broken op the 10x profiler records as contract-N/A: the
# replicated layout writes events as 16 part files, and the op's own
# guard (ADVICE r3) declares it single-dense-file-only.
CONTRACT_NA = {
    "scan_metadata_row_index": (
        "declared single-file premise broken by the 16-part replicated "
        "layout (same contract_na as docs/PROFILE_10x.json)"
    ),
}


# ---------------------------------------------------------------------------
# Scale-tractable oracle overrides (round-9, VERDICT r8 item 3).
#
# Two registry oracles are correct but have super-linear EVALUATION
# cost that exceeds any reasonable budget at 10x — the cost is the
# oracle's materialization strategy, not the comparison:
#
# - graph_connected_components: the recursive-CTE transitive closure
#   materializes every (node, reachable-node) pair — O(sum of
#   component-size^2) rows, 307 s at 3x and super-quadratic beyond.
# - dedup_minhash_recall_eval: the truth arm DISTINCTs the inverted-
#   index self-join then re-joins both shingle arrays per pair for
#   list_intersect — 1,517 s at 3x.
#
# Each override computes THE SAME mathematical object with a scalable
# evaluation: iterative min-label propagation to a fixed point for
# components (any correct CC algorithm yields the identical labelling
# because component id == min reachable node id), and the
# shared-shingle-count identity for the truth arm (both sides of the
# index join are per-doc-distinct, so the per-pair join-row count IS
# |A∩B|, and |A∪B| = n1 + n2 - i; the Arasu'06 size filter at t=0.5
# is lossless).  Overrides are OPT-IN (PARITY_SCALED_ORACLES=1), every
# record that used one carries "scaled_oracle": true, and
# tests/test_scaled_oracles.py locks each override value-identical to
# the original registry oracle on the driver fixture — so the scaled
# artifact chains to the independent oracle through an equality that
# is itself machine-checked.
# ---------------------------------------------------------------------------


def _cc_oracle_iterative(con) -> str:
    """Connected components by min-label propagation + pointer jumping
    in DuckDB temp tables (the same O(log diameter) loop the engine
    runs, re-implemented against the oracle's own edge definition).
    Convergence detector: sum(label) is strictly decreasing until the
    fixed point (labels only ever decrease, bounded below)."""
    con.execute("""
CREATE OR REPLACE TEMP TABLE cc_e AS
WITH op_ AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
             FROM lineitem WHERE l_orderkey % 97 = 0)
SELECT a.p AS src, b.p AS dst FROM op_ a JOIN op_ b
ON a.k = b.k AND a.p <> b.p
""")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE cc_l AS "
        "SELECT DISTINCT src AS node, src AS label FROM cc_e"
    )
    prev = None
    for _ in range(64):
        # one hop of neighbor-min propagation ...
        con.execute("""
CREATE OR REPLACE TEMP TABLE cc_hop AS
SELECT l.node, least(l.label, coalesce(m.nbr, l.label)) AS label
FROM cc_l l LEFT JOIN (
  SELECT e.dst AS node, min(l2.label) AS nbr
  FROM cc_e e JOIN cc_l l2 ON l2.node = e.src GROUP BY e.dst
) m ON m.node = l.node
""")
        # ... then pointer jumping (label := label-of-label)
        con.execute("""
CREATE OR REPLACE TEMP TABLE cc_next AS
SELECT a.node, least(a.label, coalesce(b.label, a.label)) AS label
FROM cc_hop a LEFT JOIN cc_hop b ON b.node = a.label
""")
        con.execute("CREATE OR REPLACE TEMP TABLE cc_l AS SELECT * FROM cc_next")
        cur = con.execute("SELECT sum(label) FROM cc_l").fetchone()[0]
        if cur == prev:
            return (
                "SELECT CAST(node AS BIGINT) AS node, "
                "CAST(label AS BIGINT) AS component FROM cc_l ORDER BY node"
            )
        prev = cur
    raise RuntimeError("cc scaled oracle: no fixed point in 64 rounds")


def _minhash_eval_scaled(con) -> str:
    """dedup_minhash_recall_eval oracle with the truth arm evaluated
    via the shared-shingle-count identity instead of candidate-DISTINCT
    + per-pair list_intersect, and each arm MATERIALIZED into a temp
    table before the summary row reads their counts.

    The materialization is load-bearing, not style: every arm is
    individually fast at 10x (truth group-count 13 s, candidate join
    4 s, band signatures <2 s — measured), but the registry oracle's
    single-statement shape puts five scalar subqueries over shared
    CTEs into one plan, and DuckDB's evaluation of that combined tree
    spilled >80 GB of hash-join temp at 10x where the arms run alone
    in seconds.  Stepwise temp tables pin the fast per-arm plans and
    make the final summary a read over three tiny relations — the
    same imperative pattern as the CC override above."""
    from trip_data_pipeline_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_MOD,
        MINHASH_PERMS,
        SHINGLE_K,
        _duck_hex28,
        _SHINGLES_DUCK,
    )
    from trip_data_pipeline_spark.operators.text_ops import _duck_words

    base = f"""
WITH d AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
d3 AS (SELECT doc_id, ws FROM d WHERE len(ws) >= {SHINGLE_K})
SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM d3
"""
    con.execute(f"CREATE OR REPLACE TEMP TABLE mh_sh AS {base}")
    con.execute("""
CREATE OR REPLACE TEMP TABLE mh_truth AS
WITH nsz AS (SELECT doc_id, count(*) AS n FROM mh_sh GROUP BY doc_id),
she AS (SELECT mh_sh.doc_id, mh_sh.s, nsz.n
        FROM mh_sh JOIN nsz USING (doc_id))
SELECT doc_id1, doc_id2 FROM (
  SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
         a.n AS n1, b.n AS n2, count(*) AS i_
  FROM she a JOIN she b
    ON a.s = b.s AND a.doc_id < b.doc_id
   AND b.n <= 2 * a.n AND a.n <= 2 * b.n
  GROUP BY 1, 2, 3, 4
) WHERE 2 * i_ >= n1 + n2 - i_
""")
    con.execute(f"""
CREATE OR REPLACE TEMP TABLE mh_cand AS
WITH hx AS (
  SELECT doc_id,
         {_duck_hex28('md5(s)', 1)} AS a,
         {_duck_hex28('md5(s)', 8)} AS b
  FROM mh_sh
),
hj AS (
  SELECT doc_id, j, min((a + (j + 1) * b) % {MINHASH_MOD}) AS mh
  FROM hx CROSS JOIN (SELECT unnest(range(0, {MINHASH_PERMS})) AS j) perms
  GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, j // {MINHASH_PERMS // LSH_BANDS} AS band_idx,
         string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS band_key
  FROM hj GROUP BY doc_id, band_idx
)
SELECT DISTINCT b1.doc_id AS doc_id1, b2.doc_id AS doc_id2
FROM bands b1
JOIN bands b2 ON b1.band_idx = b2.band_idx
             AND b1.band_key = b2.band_key
             AND b1.doc_id < b2.doc_id
""")
    con.execute("""
CREATE OR REPLACE TEMP TABLE mh_hit AS
SELECT t.doc_id1 FROM mh_truth t
JOIN mh_cand c ON c.doc_id1 = t.doc_id1 AND c.doc_id2 = t.doc_id2
""")
    return """
SELECT CAST((SELECT count(*) FROM mh_truth) AS BIGINT) AS n_truth,
       CAST((SELECT count(*) FROM mh_cand) AS BIGINT) AS n_cand,
       CAST((SELECT count(*) FROM mh_hit) AS BIGINT) AS n_hit,
       CAST((1000000 * (SELECT count(*) FROM mh_hit))
              // (SELECT count(*) FROM mh_truth) AS BIGINT) AS recall_ppm,
       CAST((1000000 * (SELECT count(*) FROM mh_hit))
              // (SELECT count(*) FROM mh_cand) AS BIGINT) AS precision_ppm
"""


def _shingle_containment_scaled(con) -> str:  # noqa: ARG001 — uniform signature
    """dedup_shingle_containment oracle with the verify arm evaluated
    via the shared-shingle-count identity: sset is per-doc distinct
    (list_distinct), so the per-pair join-row count over the inverted
    index IS |A∩B| — no candidate-DISTINCT, no per-pair re-join, no
    list_intersect over the full arrays.  The 10*nb >= 9*na size
    filter is lossless (a qualifying pair has i >= ceil(0.9*na) and
    i <= nb, hence 10*nb >= 9*na).  Shingle construction is verbatim
    from the registry oracle (scale4.py dedup_shingle_containment)."""
    return """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
d3 AS (SELECT doc_id, ws FROM d WHERE len(ws) >= 3),
sets_ AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        for i in range(1, len(ws) - 1)]) AS sset
  FROM d3
),
she AS (SELECT doc_id, len(sset) AS n, unnest(sset) AS s FROM sets_)
SELECT small_id, big_id,
       CAST(i_ AS BIGINT) AS n_shared,
       CAST(na AS BIGINT) AS n_small
FROM (
  SELECT a.doc_id AS small_id, b.doc_id AS big_id,
         count(*) AS i_, a.n AS na
  FROM she a JOIN she b
    ON a.s = b.s AND a.doc_id <> b.doc_id
   AND 10 * b.n >= 9 * a.n
  GROUP BY 1, 2, 4
) WHERE 10 * i_ >= 9 * na
"""
# NOTE (ADVICE r9): the shingle-construction SQL above (string_split,
# k=3, list-comprehension shingles) intentionally duplicates the
# registry oracle in scale4.py rather than importing it — the registry
# oracle is a single opaque SQL string with the verify arm fused in, so
# there is no shared sub-expression to factor without rewriting it.
# The duplication is guarded: tests/test_scaled_oracles.py locks this
# override value-identical to the registry oracle at sf0.01, so any
# tokenization drift in either copy fails that lock before it can skew
# an at-scale sweep.


def _decontam_scaled(con) -> str:
    """corpus_decontam_fuzzy oracle with the verification arm evaluated
    CANDIDATE-DRIVEN — the same round-11 semi-join pruning the op
    itself ships (scale5.py): sh / cand materialize stepwise into temp
    tables, both shingle legs of the intersection count are
    semi-filtered to the LSH candidate doc sets, and doc sizes still
    compute over the UNPRUNED shingle sets.  The registry oracle's
    single-statement form joins the FULL inverted index against itself
    before the candidate filter (the exact plan shape the op fix
    removed), which blows the oracle budget from 100x up.  Same
    mathematical object; value-locked to the registry oracle at sf0.01
    by tests/test_scaled_oracles.py.  Shingle/minhash construction is
    shared verbatim with the registry oracles via _SHINGLES_DUCK and
    the minhash constants."""
    from trip_data_pipeline_spark.operators.dedup import (
        LSH_BANDS,
        MINHASH_MOD,
        MINHASH_PERMS,
        SHINGLE_K,
        _duck_hex28,
        _SHINGLES_DUCK,
    )
    from trip_data_pipeline_spark.operators.text_ops import _duck_words

    con.execute(f"""
CREATE OR REPLACE TEMP TABLE dc_sh AS
WITH d AS (SELECT doc_id, {_duck_words()} AS ws FROM documents),
d3 AS (SELECT doc_id, ws FROM d WHERE len(ws) >= {SHINGLE_K})
SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS s FROM d3
""")
    con.execute(f"""
CREATE OR REPLACE TEMP TABLE dc_cand AS
WITH hx AS (
  SELECT doc_id,
         {_duck_hex28('md5(s)', 1)} AS a,
         {_duck_hex28('md5(s)', 8)} AS b
  FROM dc_sh
),
hj AS (
  SELECT doc_id, j, min((a + (j + 1) * b) % {MINHASH_MOD}) AS mh
  FROM hx CROSS JOIN (SELECT unnest(range(0, {MINHASH_PERMS})) AS j) perms
  GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, j // {MINHASH_PERMS // LSH_BANDS} AS band_idx,
         string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j) AS band_key
  FROM hj GROUP BY doc_id, band_idx
)
SELECT DISTINCT t.doc_id AS train_doc, e.doc_id AS eval_doc
FROM bands t
JOIN bands e ON t.band_idx = e.band_idx
            AND t.band_key = e.band_key
            AND t.doc_id % 97 != 0 AND e.doc_id % 97 = 0
""")
    con.execute("""
CREATE OR REPLACE TEMP TABLE dc_i AS
SELECT st.doc_id AS train_doc, se.doc_id AS eval_doc, count(*) AS i_
FROM (SELECT * FROM dc_sh
      WHERE doc_id IN (SELECT train_doc FROM dc_cand)) st
JOIN (SELECT * FROM dc_sh
      WHERE doc_id IN (SELECT eval_doc FROM dc_cand)) se
  ON st.s = se.s
JOIN dc_cand c ON c.train_doc = st.doc_id AND c.eval_doc = se.doc_id
GROUP BY 1, 2
""")
    return """
WITH sz AS (SELECT doc_id, count(*) AS n FROM dc_sh GROUP BY doc_id),
hits AS (
  SELECT dc_i.train_doc, dc_i.eval_doc
  FROM dc_i
  JOIN sz s1 ON s1.doc_id = dc_i.train_doc
  JOIN sz s2 ON s2.doc_id = dc_i.eval_doc
  WHERE 2 * dc_i.i_ >= s1.n + s2.n - dc_i.i_
)
SELECT train_doc AS doc_id,
       CAST(count(*) AS BIGINT)      AS n_eval_dups,
       CAST(min(eval_doc) AS BIGINT) AS first_eval_dup
FROM hits GROUP BY train_doc
"""


def _triangle_scaled(con) -> str:
    """graph_triangle_count oracle evaluated STEPWISE — the registry
    oracle already uses the right algorithm (degree-ordered
    orientation, each triangle enumerated once), but its
    single-statement form fuses edge construction, degree join,
    orientation and the two-hop wedge join into one DuckDB plan that
    blows the oracle budget at 1000x, exactly the plan-fusion spill
    class the CC and minhash overrides fixed.  Materializing e / o /
    tri into temp tables pins the fast per-stage plans; the SQL text
    of each stage is verbatim from the registry oracle.  Value-locked
    at sf0.01 by tests/test_scaled_oracles.py."""
    con.execute("""
CREATE OR REPLACE TEMP TABLE tc_e AS
WITH op_ AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p
             FROM lineitem WHERE l_orderkey % 97 = 0)
SELECT DISTINCT a.p AS src, b.p AS dst
FROM op_ a JOIN op_ b ON a.k = b.k AND a.p <> b.p
""")
    con.execute("""
CREATE OR REPLACE TEMP TABLE tc_o AS
WITH deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
             FROM tc_e GROUP BY 1)
SELECT tc_e.src AS u, tc_e.dst AS v
FROM tc_e JOIN deg du ON du.node = tc_e.src
          JOIN deg dv ON dv.node = tc_e.dst
WHERE du.d < dv.d OR (du.d = dv.d AND tc_e.src < tc_e.dst)
""")
    con.execute("""
CREATE OR REPLACE TEMP TABLE tc_tri AS
SELECT e1.u AS a, e1.v AS b, e2.v AS c
FROM tc_o e1
JOIN tc_o e2 ON e2.u = e1.v
JOIN tc_o e3 ON e3.u = e1.u AND e3.v = e2.v
""")
    return """
WITH nodes AS (SELECT a AS node FROM tc_tri
               UNION ALL SELECT b FROM tc_tri
               UNION ALL SELECT c FROM tc_tri)
SELECT CAST(node AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS n_tri
FROM nodes GROUP BY node
ORDER BY n_tri DESC, node LIMIT 20
"""


def _normalize_tokenize_scaled(con) -> str:
    """text_normalize_tokenize oracle with the normalize+split bound
    ONCE — the registry oracle's macro expansion repeats the
    translate+string_split expression three times (len / [1] / [-1]),
    and at 5M x ~1KB docs the repeated string passes blow the oracle
    budget (VERDICT r11 item 2).  A temp table pins single evaluation;
    the three list accessors are verbatim from the registry oracle.
    Value-locked at sf0.01 by tests/test_scaled_oracles.py."""
    from trip_data_pipeline_spark.operators.text_ops import _duck_words

    con.execute(f"""
CREATE OR REPLACE TEMP TABLE tnt_m AS
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       ws[1]                   AS first_token,
       ws[-1]                  AS last_token
FROM (SELECT doc_id, {_duck_words()} AS ws FROM documents) w
""")
    return "SELECT doc_id, n_tokens, first_token, last_token FROM tnt_m"


def _quality_score_scaled(con) -> str:
    """text_quality_score oracle with the stopword arm evaluated
    RELATIONALLY — the registry oracle's list_filter lambda executes
    per element, and at ~1.5B tokens the un-vectorized lambda pass
    (run TWICE: stop_ratio and the quality blend) blows the oracle
    budget.  The scaled form unnests once and counts stop hits with a
    vectorized grouped CASE — same count by construction (stop_hits =
    len(list_filter(ws, x -> x IN stops)) = sum over tokens of
    [x IN stops]); n_tokens = len(ws) = count(*) over the unnest
    (string_split of '' yields [''], so every doc keeps >= 1 row).
    The punct/length arithmetic is verbatim from the registry oracle.
    Value-locked at sf0.01 by tests/test_scaled_oracles.py."""
    from trip_data_pipeline_spark.operators.text_ops import (
        _duck_norm,
        _duck_words,
        _STOP_SQL,
    )

    con.execute(f"""
CREATE OR REPLACE TEMP TABLE tqs_m AS
WITH tok AS (
  SELECT doc_id, unnest({_duck_words()}) AS x FROM documents
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN x IN ({_STOP_SQL}) THEN 1 ELSE 0 END) AS DOUBLE)
         AS stop_hits
FROM tok GROUP BY doc_id
""")
    return f"""
WITH lens AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS len_raw,
         CAST(length({_duck_norm()}) AS DOUBLE) AS len_norm
  FROM documents
)
SELECT m.doc_id,
       CAST(m.n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN l.len_raw = 0 THEN NULL
            ELSE round((l.len_raw - l.len_norm) / l.len_raw, 4) END
         AS punct_ratio,
       round(m.stop_hits / m.n_tokens, 4) AS stop_ratio,
       round(least(1.0, m.n_tokens / 50.0)
             * (0.5 + 0.5 * m.stop_hits / m.n_tokens), 4) AS quality
FROM tqs_m m JOIN lens l ON l.doc_id = m.doc_id
"""


def _gopher_rules_scaled(con) -> str:
    """corpus_gopher_quality_rules oracle with the per-token measures
    evaluated RELATIONALLY — the registry oracle runs THREE per-element
    list lambdas per doc (list_filter stop-hits, list_transform
    lengths, list_aggregate max), which blows the budget at ~1.5B
    tokens.  The scaled form unnests once and computes all four
    measures as one vectorized grouped aggregate: n_words = len(ws) =
    count(*); n_tok_chars = length(nt) - (len(ws) - 1) =
    sum(length(token)) exactly (k tokens joined by k-1 single spaces
    reconstruct nt); stop_hits / max_wlen are grouped CASE/max.  The
    rule bitmask stage is verbatim from the registry oracle.
    Value-locked at sf0.01 by tests/test_scaled_oracles.py."""
    from trip_data_pipeline_spark.operators.text_ops import _duck_words

    con.execute(f"""
CREATE OR REPLACE TEMP TABLE gqr_m AS
WITH tok AS (
  SELECT doc_id, unnest({_duck_words()}) AS x FROM documents
)
SELECT doc_id,
       count(*) AS n_words,
       sum(length(x)) AS n_tok_chars,
       sum(CASE WHEN x IN ('the','a','of','to','and') THEN 1 ELSE 0 END)
         AS stop_hits,
       max(length(x)) AS max_wlen
FROM tok GROUP BY doc_id
""")
    return """
WITH f AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words BETWEEN 20 AND 100000 THEN 0 ELSE 1 END
       + CASE WHEN 3 * n_words <= n_tok_chars
               AND n_tok_chars <= 10 * n_words THEN 0 ELSE 2 END
       + CASE WHEN stop_hits >= 2 THEN 0 ELSE 4 END
       + CASE WHEN max_wlen <= 15 THEN 0 ELSE 8 END AS failed_mask
  FROM gqr_m
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(failed_mask AS BIGINT) AS failed_mask,
       failed_mask = 0 AS passes
FROM f
"""


SCALED_ORACLES = {
    "graph_connected_components": _cc_oracle_iterative,
    "dedup_minhash_recall_eval": _minhash_eval_scaled,
    "dedup_shingle_containment": _shingle_containment_scaled,
    "corpus_decontam_fuzzy": _decontam_scaled,
    "graph_triangle_count": _triangle_scaled,
    "text_normalize_tokenize": _normalize_tokenize_scaled,
    "text_quality_score": _quality_score_scaled,
    "corpus_gopher_quality_rules": _gopher_rules_scaled,
}


# ---------------------------------------------------------------------------
# builder-declared 1000x exclusions (VERDICT r10 item 3 / r11 item 1).
# Declared HERE as a constant and merged into EVERY 1000x-artifact write
# below, so a sweep regen can never drop the machine-readable record
# again (r11 commit 7fdc927 regenerated docs/PARITY_1000x_subset.json
# whole and silently dropped what 145df19 had added).  Each entry is a
# measured rationale plus the op's at-scale fallback record.
# ---------------------------------------------------------------------------

EXCLUSIONS_1000X = {
    "_note": (
        "builder-declared 1000x exclusions (VERDICT r10 item 3: a recorded "
        "budget rationale for every exclusion); each op has an at-scale "
        "record in docs/PARITY_100x_subset.json and the full-registry "
        "docs/PARITY_10x.json.  Merged from the EXCLUSIONS_1000X constant "
        "in tools/parity_sweep.py on every 1000x artifact write (VERDICT "
        "r11 item 1: regen-proof)."
    ),
    "corpus_decontam_fuzzy": (
        "content-quadratic on the REPLICATED layout (join_theta_band "
        "class): key-shifted copies share text content, so true cross-copy "
        "near-dup pairs - the op's correct output - grow with the square "
        "of the replication factor; the round-11 candidate semi-join "
        "pruning fixed the PLAN-side quadratic (the blind inverted-index "
        "join that exhausted 64 GB of shuffle spill disk here), but the "
        "remaining work is real answer mass, not plan waste.  Recorded "
        "HASH-OK at 100x against the candidate-driven scaled oracle "
        "(value-locked to the registry oracle by "
        "tests/test_scaled_oracles.py)."
    ),
    "corpus_semdedup_bucket": (
        "same content-quadratic class: SemDeDup's intrinsic O(n^2/k) "
        "within-cluster term assumes k scales ~sqrt(n); the replicated "
        "layout multiplies n by 1000 while the fixture codebook stays "
        "capped, and identical cross-copy vectors all land in the same "
        "cluster.  Measured: single within-cluster task >20 min without "
        "completing.  Registry-oracle evaluation carries the same "
        "intrinsic term, so at 100x the record is ORACLE-BUDGET-NA; the "
        "full value check is HASH-OK at 10x in docs/PARITY_10x.json."
    ),
    "stream_stream_join": (
        "single-micro-batch drain limit: AvailableNow over the static "
        "fixture processes the full 30-day history in ONE micro-batch, so "
        "the watermark never evicts mid-batch and the join state store "
        "must hold both sides' 100M events - measured >70 min without one "
        "of 16 tasks completing at 1000x.  In production arrivals span "
        "micro-batches and the 1h watermark bounds state to one hour of "
        "events per key; the binding constraint is the harness's drain "
        "pattern, not the plan.  MEASURED CLOSED in round 12: the paced "
        "multi-part drain (tools/stream_paced_1000x.py, 128 event-time "
        "range parts, maxFilesPerTrigger=4) bounds state, completes in "
        "~30 min where the single-batch drain could not finish one task "
        "in >70 min, and the op is FP-OK + SAMPLE-OK over 343.6M output "
        "rows at 1000x - docs/PARITY_STREAM_1000x.json.  Stays excluded "
        "from THIS artifact only because the single-batch AvailableNow "
        "drain protocol of this subset remains state-unbounded by "
        "construction."
    ),
    "stream_outer_join_watermark": (
        "same single-micro-batch full-history join-state limit as "
        "stream_stream_join (identical join physics; the outer variant "
        "adds the null-extended tail).  MEASURED CLOSED in round 12 by "
        "the same paced drain: FP-OK + SAMPLE-OK over 343.6M matched "
        "rows at 1000x - docs/PARITY_STREAM_1000x.json."
    ),
}


# ---------------------------------------------------------------------------
# canonical row encoding — MUST stay identical between the two engines
# ---------------------------------------------------------------------------

NULL_SENTINEL = "\x01"


def spark_canon_col(name: str, dtype: str):
    """Spark Column rendering `name` to its canonical string."""
    col = F.col(name)
    if dtype == "string":
        e = col
    elif dtype in ("double", "float"):
        # NULL must short-circuit BEFORE format_string: Java's
        # String.format("%.6f", null) renders the literal string
        # "null", which would bypass the coalesce sentinel (caught by
        # the round-8 forced-fingerprint validation on the outer joins)
        #
        # Known tie-rendering hazard (ADVICE r8): Java %.6f rounds
        # HALF_UP while DuckDB printf %.6f rounds half-to-even, so a
        # double whose exact decimal expansion has a 5 in the 7th
        # place (odd multiples of 2^-7, e.g. 0.0078125 -> '0.007813'
        # vs '0.007812') renders differently and would surface as a
        # spurious fingerprint FAIL (then a visible FP-INT-OK
        # downgrade, never a silent pass).  Ops whose doubles are
        # pre-rounded via F.round(x, <=5) are immune (one guaranteed
        # trailing zero); un-rounded doubles at fixture magnitudes
        # have no exactly-representable 7th-place-5 values in
        # practice — no op has hit this in six full sweeps.  If one
        # ever does, re-render through a tie-free integer encoding
        # (CAST(round(x*1e6) AS BIGINT) on both engines) for that op.
        e = (
            F.when(col.isNull(), F.lit(NULL_SENTINEL))
            .when(F.isnan(col), F.lit("NaN"))
            .when(col == F.lit(float("inf")), F.lit("Inf"))
            .when(col == F.lit(float("-inf")), F.lit("-Inf"))
            .otherwise(F.format_string("%.6f", col.cast("double")))
        )
    elif (
        dtype in ("bigint", "int", "smallint", "tinyint", "boolean")
        or dtype.startswith("decimal")
    ):
        e = col.cast("string")
    elif dtype == "date":
        e = col.cast("string")
    elif dtype == "timestamp":
        e = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    else:
        raise ValueError(f"fingerprint mode cannot encode spark type {dtype!r}")
    return F.coalesce(e, F.lit(NULL_SENTINEL))


def duck_canon_col(name: str, dtype: str) -> str:
    """DuckDB SQL expression rendering `name` to the SAME canonical
    string spark_canon_col produces."""
    q = f'"{name}"'
    t = dtype.upper()
    if t == "VARCHAR":
        e = q
    elif t in ("DOUBLE", "FLOAT", "REAL"):
        e = (
            f"CASE WHEN isnan({q}) THEN 'NaN' "
            f"WHEN {q} = 'infinity'::DOUBLE THEN 'Inf' "
            f"WHEN {q} = '-infinity'::DOUBLE THEN '-Inf' "
            f"ELSE printf('%.6f', CAST({q} AS DOUBLE)) END"
        )
    elif t in (
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
        "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT", "BOOLEAN",
    ) or t.startswith("DECIMAL"):
        e = f"CAST({q} AS VARCHAR)"
    elif t == "DATE":
        e = f"CAST({q} AS VARCHAR)"
    elif t == "TIMESTAMP":
        e = f"strftime({q}, '%Y-%m-%d %H:%M:%S.%f')"
    else:
        raise ValueError(f"fingerprint mode cannot encode duckdb type {dtype!r}")
    return f"coalesce({e}, chr(1))"


def _duck_hexparse(expr: str, start: int, n: int) -> str:
    """Parse n hex chars of `expr` starting at 1-based `start` to an
    integer (DuckDB has no from-hex; positional strpos fold, the
    generalization of operators/dedup.py's _duck_hex28)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}::HUGEINT"
        for i in range(n)
    ) + ")"


def spark_fingerprint(df) -> tuple[int, int, int]:
    """(count, sum of md5 chunk1, sum of chunk2) over canonical rows."""
    dtypes = dict(df.dtypes)
    cols = sorted(df.columns)
    h = F.md5(F.concat_ws("|", *[spark_canon_col(c, dtypes[c]) for c in cols]))
    agg = df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.conv(F.substring("h", 1, 14), 16, 10).cast("decimal(38,0)")).alias("f1"),
        F.sum(F.conv(F.substring("h", 15, 14), 16, 10).cast("decimal(38,0)")).alias("f2"),
    ).collect()[0]
    return int(agg["n"]), int(agg["f1"] or 0), int(agg["f2"] or 0)


def duck_fingerprint(con, sql: str) -> tuple[int, int, int]:
    body = sql.rstrip().rstrip(";")
    desc = con.execute(f"DESCRIBE SELECT * FROM ({body})").fetchall()
    cols = sorted((r[0], r[1]) for r in desc)
    canon = ", ".join(duck_canon_col(c, t) for c, t in cols)
    row = con.execute(
        f"SELECT count(*), "
        f"sum({_duck_hexparse('h', 1, 14)}), "
        f"sum({_duck_hexparse('h', 15, 14)}) "
        f"FROM (SELECT md5(concat_ws('|', {canon})) AS h FROM ({body}))"
    ).fetchone()
    return int(row[0]), int(row[1] or 0), int(row[2] or 0)


# ---------------------------------------------------------------------------
# float-tolerant fallbacks — double SUMs at 10x magnitudes (~1e11+)
# legitimately differ between engines beyond %.6f: summation order is
# engine-private and IEEE addition is not associative, so ~1e-14
# relative noise crosses the 6-decimals-after-the-point boundary once
# the integer part has 12+ digits.  The driver contract stays %.6f at
# sf0.01 (where magnitudes keep it exact); at scale the sweep first
# tries the strict form, then re-compares doubles at 9 SIGNIFICANT
# digits (%.9g, rel ~1e-9 — still far tighter than any real defect)
# and reports FLOAT-TOL-OK so the relaxation is visible, never silent.
# ---------------------------------------------------------------------------


def _canon_val_tol(v):
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    from tests.oracle import _canon_val

    return _canon_val(v)


def canon_rows_tol(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon_val_tol(r[i]) for i in order) for r in rows), key=repr
    )


# ---------------------------------------------------------------------------
# Stratified exact-sample mode (round-10, VERDICT r9 item 4): above the
# row cap the full outputs compare via the md5-sum fingerprint, which
# is a weaker check exactly on the ops with the largest outputs (a sum
# of hashes could in principle cancel).  Alongside the fingerprint,
# compare a deterministic CONTENT-ADDRESSED sample exactly, driver-bag
# style: a row is sampled iff the md5 of its canonical INTEGER/STRING
# skeleton (floats excluded from the selection hash so ~1e-14 double
# noise cannot flip which rows are chosen) taken mod K equals 0, with
# K sized for >= ~SAMPLE_TARGET rows.  Both engines evaluate the same
# predicate over the same canonical encoding, so the selected bags are
# identical by construction iff the underlying rows are; the sampled
# rows then compare with the driver's exact canonicalization (full
# row, floats included; 9-significant-digit fallback mirrors the
# FLOAT-TOL path and reports SAMPLE-FLOAT-TOL-OK, never silently).
# ---------------------------------------------------------------------------

SAMPLE_TARGET = int(os.environ.get("PARITY_SAMPLE_TARGET", "125000"))


def exact_sample_check(con, df, oracle: str, total_rows: int) -> dict:
    dtypes = dict(df.dtypes)
    skel = sorted(c for c in df.columns if dtypes[c] not in ("double", "float"))
    if not skel:
        return {"status": "SAMPLE-NA",
                "detail": "all-float schema — no stable selection skeleton"}
    k = max(2, total_rows // SAMPLE_TARGET)
    h = F.md5(F.concat_ws("|", *[spark_canon_col(c, dtypes[c]) for c in skel]))
    sel = (
        F.conv(F.substring(h, 1, 14), 16, 10).cast("decimal(38,0)") % k == 0
    )
    s_raw = [tuple(r) for r in df.filter(sel).limit(CAP + 1).collect()]
    body = oracle.rstrip().rstrip(";")
    desc = con.execute(f"DESCRIBE SELECT * FROM ({body})").fetchall()
    dt = {r[0]: r[1] for r in desc}
    dcanon = ", ".join(duck_canon_col(c, dt[c]) for c in skel)
    sample_sql = (
        f"SELECT * EXCLUDE (__ps_h) FROM ("
        f"SELECT *, md5(concat_ws('|', {dcanon})) AS __ps_h FROM ({body})"
        f") WHERE {_duck_hexparse('__ps_h', 1, 14)} % {k} = 0"
    )
    d_cols, d_raw = _with_budget(
        con, lambda: duck_result(con, f"SELECT * FROM ({sample_sql}) LIMIT {CAP + 1}")
    )
    if len(s_raw) > CAP or len(d_raw) > CAP:
        return {"status": "SAMPLE-NA", "k": k,
                "detail": "sample exceeded the row cap on one side"}
    s_cols = list(df.columns)
    sc = canon_rows(s_cols, s_raw)
    dc = canon_rows(d_cols, d_raw)
    if sc == dc:
        return {"status": "SAMPLE-OK", "rows": len(sc), "k": k}
    has_float = len(skel) < len(df.columns)
    if has_float and canon_rows_tol(s_cols, s_raw) == canon_rows_tol(d_cols, d_raw):
        return {
            "status": "SAMPLE-FLOAT-TOL-OK", "rows": len(sc), "k": k,
            "detail": "strict %.6f mismatch on floats; equal at 9 sig digits",
        }
    dset, sset = set(dc), set(sc)
    return {
        "status": "SAMPLE-FAIL", "k": k,
        "detail": {
            "rows_spark": len(sc), "rows_duck": len(dc),
            "spark_only": [repr(r) for r in sc if r not in dset][:3],
            "duck_only": [repr(r) for r in dc if r not in sset][:3],
        },
    }


def check_op(spark, con, name: str, sf_dir: str, scaled: bool = False) -> dict:
    o = OPS[name]
    t0 = time.time()
    rec: dict = {}
    df = o.fn(spark, sf_dir)
    if o.oracle is None:
        rec.update(status="ROWS-RAN", mode="rows", rows=df.count())
        rec["secs"] = round(time.time() - t0, 2)
        return rec
    oracle = o.oracle
    if scaled and name in SCALED_ORACLES:
        # The override's temp-table materialization is the heavy part of
        # these oracles, so it must sit under the same budget interrupt
        # as the comparison reads (ADVICE r9): a regressed override plan
        # records ORACLE-BUDGET-NA instead of stalling the sweep.
        oracle = _with_budget(con, lambda: SCALED_ORACLES[name](con))
        rec["scaled_oracle"] = True
    s_rows = df.limit(CAP + 1).collect()
    if len(s_rows) <= CAP:
        body = oracle.rstrip().rstrip(";")
        d_cols, d_raw = _with_budget(
            con, lambda: duck_result(con, f"SELECT * FROM ({body}) LIMIT {CAP + 1}")
        )
        s_cols = list(df.columns)
        if sorted(s_cols) != sorted(d_cols):
            rec.update(status="FAIL", mode="exact", rows=len(s_rows),
                       detail=f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        elif len(d_raw) > CAP:
            rec.update(status="FAIL", mode="exact", rows=len(s_rows),
                       detail=f"duck rows > cap while spark rows={len(s_rows)}")
        else:
            s_raw = [tuple(r) for r in s_rows]
            driver_sort_check(s_cols, s_raw)
            driver_sort_check(d_cols, d_raw)
            sc = canon_rows(s_cols, s_raw)
            dc = canon_rows(d_cols, d_raw)
            has_float = any(t in ("double", "float") for _, t in df.dtypes)
            if sc == dc:
                rec.update(status="HASH-OK", mode="exact", rows=len(sc))
            elif has_float and canon_rows_tol(s_cols, s_raw) == canon_rows_tol(
                d_cols, d_raw
            ):
                rec.update(
                    status="FLOAT-TOL-OK", mode="exact", rows=len(sc),
                    detail="strict %.6f mismatch; equal at 9 significant digits",
                )
            else:
                dset, sset = set(dc), set(sc)
                rec.update(
                    status="FAIL", mode="exact", rows=len(sc),
                    detail={
                        "rows_spark": len(sc), "rows_duck": len(dc),
                        "spark_only": [repr(r) for r in sc if r not in dset][:3],
                        "duck_only": [repr(r) for r in dc if r not in sset][:3],
                    },
                )
    else:
        sn, s1, s2 = spark_fingerprint(df)
        dn, d1, d2 = _with_budget(con, lambda: duck_fingerprint(con, oracle))
        if (sn, s1, s2) == (dn, d1, d2):
            rec.update(status="FP-OK", mode="fingerprint", rows=sn)
        else:
            float_cols = [c for c, t in df.dtypes if t in ("double", "float")]
            if float_cols and len(float_cols) < len(df.columns):
                # engine-side %.12g is not portable (Java %g pads,
                # C %g strips) — fall back to the integer/string
                # skeleton and report the exclusion explicitly.  The
                # len guard (ADVICE r8): an all-double schema would
                # leave zero skeleton columns and a syntactically
                # invalid 'SELECT  FROM' oracle — fall through to
                # plain FAIL instead, which is the honest status.
                sk = df.drop(*float_cols)
                body = oracle.rstrip().rstrip(";")
                keep = ", ".join(f'"{c}"' for c in sk.columns)
                sn2, s12, s22 = spark_fingerprint(sk)
                dn2, d12, d22 = _with_budget(
                    con, lambda: duck_fingerprint(con, f"SELECT {keep} FROM ({body})")
                )
                if (sn2, s12, s22) == (dn2, d12, d22):
                    rec.update(
                        status="FP-INT-OK", mode="fingerprint", rows=sn,
                        detail=(
                            "strict fingerprint mismatch; equal after "
                            f"excluding float columns {float_cols} "
                            "(engine-side %.6f is magnitude-limited at "
                            "10x double-sum scales)"
                        ),
                    )
                    rec["sample"] = exact_sample_check(con, df, oracle, sn)
                    if rec["sample"]["status"] == "SAMPLE-FAIL":
                        rec["status"] = "FAIL"
                        rec["detail"] = {"sample": rec["sample"]["detail"]}
                    # secs AFTER the sample pass (ADVICE r10): both
                    # fingerprint branches now time identically.
                    rec["secs"] = round(time.time() - t0, 2)
                    return rec
            rec.update(status="FAIL", mode="fingerprint", rows=sn,
                       detail={"spark": [sn, str(s1), str(s2)],
                               "duck": [dn, str(d1), str(d2)]})
    if rec.get("mode") == "fingerprint" and rec["status"] == "FP-OK":
        rec["sample"] = exact_sample_check(con, df, oracle, rec["rows"])
        if rec["sample"]["status"] == "SAMPLE-FAIL":
            rec["status"] = "FAIL"
            rec["detail"] = {"sample": rec["sample"]["detail"]}
    rec["secs"] = round(time.time() - t0, 2)
    return rec


def main() -> int:
    # argv parsed only under __main__ (ADVICE r6 precedent on
    # tools/profile_ops.py: tool modules must be importable — the
    # fingerprint encoder is imported by tests/test_parity_fingerprint).
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_x10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "PARITY_10x.json",
    )
    if not os.path.exists(os.path.join(sf_dir, "_DONE")) and "testdata" not in sf_dir:
        raise SystemExit(f"layout missing at {sf_dir} — run tools/scale_probe.py")
    queries()
    from trip_data_pipeline_spark import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)
    scaled = os.environ.get("PARITY_SCALED_ORACLES", "") == "1"
    results: dict[str, dict] = {}
    out = {
        "protocol": (
            f"tools/parity_sweep.py: every registered op vs its DuckDB oracle "
            f"on {sf_dir}; exact driver-parity bag compare when rows <= {CAP}, "
            f"engine-side md5 canonical-row fingerprint (two 56-bit sums) above, "
            f"PLUS a content-addressed stratified exact-sample bag compare "
            f"(skeleton-hash mod K, target ~{SAMPLE_TARGET} rows) on every "
            f"fingerprint-compared op (round-10)"
            + (
                f"; PARITY_SCALED_ORACLES=1 — ops in {sorted(SCALED_ORACLES)} "
                "use the scale-tractable oracle evaluation (value-locked to "
                "the registry oracle by tests/test_scaled_oracles.py), "
                "flagged per-record as scaled_oracle"
                if scaled
                else ""
            )
        ),
        "sf_dir": sf_dir,
        "cap_rows": CAP,
        "results": results,
    }
    if "1000x" in os.path.basename(out_path):
        # Regen-proof (VERDICT r11 item 1): the declared-exclusions
        # record rides along on EVERY 1000x artifact write — periodic
        # checkpoints and the final dump alike — so regenerating the
        # subset can never drop it again.
        out["exclusions"] = EXCLUSIONS_1000X
    names = sorted(OPS)
    # PARITY_RESUME=1: keep OK-family results already recorded in
    # out_json (an interrupted sweep restarts where it left off; FAILs
    # and budget-NAs always re-run on the current engine).
    if os.environ.get("PARITY_RESUME", "") == "1" and os.path.exists(out_path):
        ok_family = {"HASH-OK", "FP-OK", "FP-INT-OK", "FLOAT-TOL-OK",
                     "ROWS-RAN", "CONTRACT-NA", "ORACLE-BUDGET-NA"}
        prior = json.load(open(out_path)).get("results", {})
        for k, v in prior.items():
            if v.get("status") in ok_family and k in OPS:
                results[k] = dict(v, resumed=True)
    subset = os.environ.get("PARITY_OPS", "").strip()
    if subset:
        want = {n.strip() for n in subset.split(",") if n.strip()}
        unknown = want - set(names)
        if unknown:
            raise SystemExit(f"unknown ops in PARITY_OPS: {sorted(unknown)}")
        names = [n for n in names if n in want]
        out["subset"] = sorted(want)
        for n in want:  # subset-named ops always re-run, even if resumed
            results.pop(n, None)
    t_all = time.time()
    n_bad = 0
    for i, name in enumerate(names, 1):
        if name in results:
            print(f"[{i}/{len(names)}] cached       {name}", flush=True)
            continue
        if name in CONTRACT_NA:
            results[name] = {"status": "CONTRACT-NA", "detail": CONTRACT_NA[name]}
        else:
            try:
                results[name] = check_op(spark, con, name, sf_dir, scaled=scaled)
            except OracleBudgetExceeded:
                results[name] = {
                    "status": "ORACLE-BUDGET-NA",
                    "budget_s": ORACLE_BUDGET_S,
                    "detail": (
                        f"DuckDB oracle exceeded {ORACLE_BUDGET_S:.0f}s at this "
                        "layout (oracle materialization cost, not an engine "
                        "mismatch) — parity for this op is recorded at a "
                        "smaller replication"
                    ),
                }
            except Exception as e:  # noqa: BLE001
                results[name] = {
                    "status": "ERR",
                    "detail": f"{type(e).__name__}: {str(e)[:400]}",
                }
        st = results[name]["status"]
        if st in ("FAIL", "ERR"):
            n_bad += 1
        print(f"[{i}/{len(names)}] {st:12s} {name} "
              f"({results[name].get('secs', 0)}s)", flush=True)
        if i % 10 == 0 or st in ("FAIL", "ERR"):
            with open(out_path, "w") as f:
                json.dump(out, f, indent=1)
    counts: dict[str, int] = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    out["summary"] = {
        "n_ops": len(results),
        "n_run_this_invocation": len(names),
        "by_status": counts,
        "total_secs": round(time.time() - t_all, 1),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["summary"]))
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
