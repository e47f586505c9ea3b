"""Driver-stamp freshness audit (VERDICT r9, next-round item 1).

A driver CORRECTNESS stamp certifies an op AS OF the tree the driver
ran — the "round N: verdict/advice/correctness/bench" commit.  Any
later change to the op's implementation or oracle makes the stamp
STALE: the op is still covered by pytest / sims / parity sweeps, but
the driver's own record predates its current semantics.  Round 9
closed the ledger while also landing behavioral fixes, so the class is
live; this tool makes it mechanical instead of prose.

Method (per-op, exact, no date heuristics):

1. Newest green stamp round per op, from CORRECTNESS_r*.json (same
   green predicate as tests/test_ledger.py: hash_match, or the
   declared rows-only contract).
2. For every stamp round present, check out that round's boundary
   commit into a temp git worktree and import ITS registry in a
   subprocess, dumping a per-op fingerprint:
     - src:    sha256 of the ast.dump of the op function's source with
               docstrings stripped (so comment/docstring/formatting
               churn does not flag; any code or decorator change does —
               including an inline oracle string), and
     - oracle: sha256 of the whitespace-normalized oracle SQL.
3. An op is STALE iff its fingerprint at its newest stamp round
   differs from the fingerprint on the current tree.

Output: docs/STAMP_FRESHNESS.json with per-op
{stamp_round, stale, current fp, at-stamp fp}, plus the stale list
oldest-stamp-first on stdout (the re-certification window order).
tests/test_ledger.py keeps the artifact honest: it recomputes the
current-tree fingerprints in-process and fails if the artifact has
drifted, and requires every stale op to sit in the PRIORITY window.

Known limit (documented, not hidden): the fingerprint is the op
function + its registered oracle.  A behavioral change confined to a
shared helper in ANOTHER module (e.g. the streaming batch harness)
flags only the ops whose own fn/oracle text changed with it; the
round-9 waves all did change per-op oracles or fns, so the class is
covered here, but a pure-helper change needs a manual window entry.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import re
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "docs", "STAMP_FRESHNESS.json")

if REPO not in sys.path:  # direct `python tools/stamp_freshness.py` run
    sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# fingerprinting (importable by tests — keep dependency-light)
# ---------------------------------------------------------------------------

def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(body, list)
            and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return tree


def fn_fingerprint(fn) -> str:
    # Decorators are stripped: the @op(...) call carries (name, oracle,
    # category, pure) — oracle is fingerprinted separately, and the
    # category label / pure plan-memo flag are non-behavioral, so a
    # decorator-only diff must not flag the op stale.
    fn = inspect.unwrap(fn)
    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if hasattr(node, "decorator_list"):
            node.decorator_list = []
    tree = _strip_docstrings(tree)
    return hashlib.sha256(ast.dump(tree).encode()).hexdigest()[:16]


def oracle_fingerprint(oracle: str | None) -> str:
    norm = " ".join(oracle.split()) if oracle is not None else ""
    return hashlib.sha256(norm.encode()).hexdigest()[:16]


def current_fingerprints() -> dict[str, list[str]]:
    """{op: [src_fp, oracle_fp]} for the registry importable right now."""
    from trip_data_pipeline_spark.registry import OPS, queries

    queries()  # force operator-module registration
    return {
        name: [fn_fingerprint(o.fn), oracle_fingerprint(o.oracle)]
        for name, o in OPS.items()
    }


# Self-contained dump for old trees (they predate this tool): run with
# cwd = the worktree so `-c` resolves the package from that tree.
_DUMP_SNIPPET = r"""
import ast, hashlib, inspect, json, sys, textwrap

def strip_ds(tree):
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (isinstance(body, list) and body and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)):
            node.body = body[1:] or [ast.Pass()]
    return tree

from trip_data_pipeline_spark.registry import OPS, queries
queries()
out = {}
for name, o in OPS.items():
    fn = inspect.unwrap(o.fn)
    src = textwrap.dedent(inspect.getsource(fn))
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if hasattr(node, "decorator_list"):
            node.decorator_list = []
    sfp = hashlib.sha256(ast.dump(strip_ds(tree)).encode()).hexdigest()[:16]
    norm = " ".join(o.oracle.split()) if o.oracle is not None else ""
    ofp = hashlib.sha256(norm.encode()).hexdigest()[:16]
    out[name] = [sfp, ofp]
json.dump(out, sys.stdout)
"""


# ---------------------------------------------------------------------------
# ledger + git plumbing
# ---------------------------------------------------------------------------

def _green(path: str) -> set[str]:
    out = set()
    for name, v in json.load(open(path)).items():
        if (v.get("hash_match") is True) or (
            v.get("err") == "no_oracle" and v.get("spark_rows") is not None
        ):
            out.add(name)
    return out


def newest_stamp_rounds() -> dict[str, int]:
    import glob

    stamps: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        n = int(re.search(r"_r(\d+)", path).group(1))
        for name in _green(path):
            stamps[name] = max(stamps.get(name, 0), n)
    return stamps


def round_commits() -> dict[int, str]:
    log = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout
    out: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict/advice/correctness/bench", subj)
        if m:
            out.setdefault(int(m.group(1)), sha)  # newest-first log; keep first
    return out


def fingerprints_at(commit: str) -> dict[str, list[str]]:
    import tempfile

    with tempfile.TemporaryDirectory(prefix="stampfresh_") as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            env = dict(os.environ, PYTHONPATH="")
            res = subprocess.run(
                [sys.executable, "-c", _DUMP_SNIPPET],
                cwd=wt, env=env, capture_output=True, text=True, check=True,
            )
            return json.loads(res.stdout)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, check=True, capture_output=True,
            )


def main() -> None:
    if "--dump" in sys.argv:
        json.dump(current_fingerprints(), sys.stdout)
        return

    stamps = newest_stamp_rounds()
    commits = round_commits()
    cur = current_fingerprints()

    needed_rounds = sorted({r for r in stamps.values() if r in commits})
    at_round: dict[int, dict[str, list[str]]] = {}
    for r in needed_rounds:
        print(f"fingerprinting round-{r} tree {commits[r][:10]} ...",
              file=sys.stderr)
        at_round[r] = fingerprints_at(commits[r])

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    ops: dict[str, dict] = {}
    for name in sorted(cur):
        r = stamps.get(name)
        if r is None or r not in at_round:
            # Fail CLOSED (ADVICE r10): a stamped op whose round has no
            # resolvable "round N: verdict/advice/correctness/bench"
            # boundary commit cannot be verified fresh, so it is STALE
            # — the old `stale = (r is None)` silently shrank the stale
            # list if a round commit were renamed or rewritten.
            ops[name] = {"stamp_round": r, "stale": True,
                         "current": cur[name], "at_stamp": None}
            continue
        old = at_round[r].get(name)
        ops[name] = {
            "stamp_round": r,
            "stale": old != cur[name],
            "current": cur[name],
            "at_stamp": old,
        }

    stale = sorted(
        (n for n, v in ops.items() if v["stale"]),
        key=lambda n: (ops[n]["stamp_round"] or 0, n),
    )
    artifact = {
        "head": head,
        "round_commits": {str(r): commits[r] for r in needed_rounds},
        "n_ops": len(ops),
        "n_stale": len(stale),
        "stale_oldest_stamp_first": stale,
        "ops": ops,
    }
    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    with open(ARTIFACT, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{len(stale)} stale of {len(ops)} ops -> {ARTIFACT}")
    for n in stale:
        v = ops[n]
        kind = []
        if v["at_stamp"] is None:
            kind.append("missing-at-stamp")
        else:
            if v["at_stamp"][0] != v["current"][0]:
                kind.append("fn")
            if v["at_stamp"][1] != v["current"][1]:
                kind.append("oracle")
        print(f"  r{v['stamp_round']}  {n}  [{'+'.join(kind)}]")


if __name__ == "__main__":
    main()
