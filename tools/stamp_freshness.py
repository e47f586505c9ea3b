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

Round 13 (VERDICT r12 item 1) closed the helper blind spot: the
fingerprint now has a THIRD component, `helpers`, hashing the op's
TRANSITIVE package-internal closure — every function/class reachable
from the op fn through global-name or module-attribute references into
`trip_data_pipeline_spark` modules (docstrings/decorators stripped,
same normalization as the fn hash), plus every plain-data module
constant those functions reference (canonical repr).  A rewrite of
`connected_components` or `word_ngrams` now flags every consumer op
stale even though the op functions' own text is unchanged — exactly
the class round 12 shipped without driver re-verification.  Old trees
are fingerprinted by running THIS file's --dump with cwd at the
checked-out worktree (package resolved from cwd), so both sides of the
comparison always use one closure-walk implementation.
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


_PKG = "trip_data_pipeline_spark"

# Plain-data constant types whose repr is process-deterministic (sets
# are sorted below — str hashing randomizes their iteration order).
_CONST_SCALARS = (str, bytes, bool, int, float, complex, type(None))
_CONST_TYPES = _CONST_SCALARS + (tuple, list, dict, frozenset, set)


def _const_token(v) -> str | None:
    """Canonical process-deterministic token for a plain-data constant,
    or None if `v` contains anything whose repr could embed process
    state (objects, functions — e.g. the registry's OPS dict)."""
    if isinstance(v, _CONST_SCALARS):
        return repr(v)
    if isinstance(v, (set, frozenset)):
        toks = [_const_token(x) for x in v]
        if any(t is None for t in toks):
            return None
        return "set:" + repr(sorted(toks))
    if isinstance(v, (tuple, list)):
        toks = [_const_token(x) for x in v]
        if any(t is None for t in toks):
            return None
        return ("tuple:" if isinstance(v, tuple) else "list:") + repr(toks)
    if isinstance(v, dict):
        items = [(_const_token(k), _const_token(x)) for k, x in v.items()]
        if any(a is None or b is None for a, b in items):
            return None
        return "dict:" + repr(items)  # insertion order = source order
    return None


def _resolve_import_module(defining_mod: str, target: str | None, level: int):
    """Resolve an ImportFrom's source module against the module that
    contains the import statement (handles relative levels).  Returns
    the module object from sys.modules, or None when it is outside the
    package / not loaded."""
    if level == 0:
        name = target or ""
    else:
        # Resolve like the interpreter: level=1 → the containing
        # package (__package__ — which is the module itself for a
        # package __init__), each extra level climbs one package up.
        dm = sys.modules.get(defining_mod)
        pkg = getattr(dm, "__package__", None) or defining_mod.rpartition(".")[0]
        parts = pkg.split(".") if pkg else []
        base = parts[: len(parts) - (level - 1)]
        name = ".".join(base + ([target] if target else []))
    if not name.startswith(_PKG):
        return None
    return sys.modules.get(name)


def _closure_refs(fn):
    """Transitive package-internal (functions+classes, constants)
    referenced by `fn`: {qualname: callable}, {name: token}.

    References are found syntactically — bare global names and
    one-level module-attribute accesses (`helpers.foo`) in each
    reachable function/class source — then resolved against that
    object's own globals.  Only objects whose defining module is
    inside the package recurse; constants are included when they are
    plain data (module-level literals like probe sets, grid constants)
    resolved from a package module's namespace.
    """
    import types

    seen: dict[str, object] = {}
    consts: dict[str, str] = {}
    root = inspect.unwrap(fn)
    stack = [root]
    while stack:
        f = inspect.unwrap(stack.pop())
        mod = getattr(f, "__module__", "") or ""
        if not mod.startswith(_PKG):
            continue
        key = f"{mod}.{getattr(f, '__qualname__', getattr(f, '__name__', '?'))}"
        if key in seen:
            continue
        seen[key] = f
        try:
            src = textwrap.dedent(inspect.getsource(f))
            tree = ast.parse(src)
        except (OSError, TypeError, SyntaxError):
            continue
        # Strip decorators BEFORE collecting references — mirrors
        # fn_fingerprint: the @op(...) decorator would otherwise pull
        # registry internals (op/Op/OPS/_plan_memo) into every op's
        # closure, making any registry-plumbing edit flag all 429 ops.
        for node in ast.walk(tree):
            if hasattr(node, "decorator_list"):
                node.decorator_list = []
        g = getattr(f, "__globals__", None)
        if g is None:  # classes: resolve against their module namespace
            m = sys.modules.get(mod)
            g = vars(m) if m is not None else {}
        names, attrs = set(), set()
        # Function-LOCAL imports (`from ..dedup import helper`,
        # `from . import corpus2 as c2`) bind LOCAL names the Name
        # pass below cannot resolve via __globals__ — resolve the
        # import statements themselves.  The target modules are
        # already imported (registry load), so this is a sys.modules
        # lookup plus getattr, not new execution.  `local_binds` then
        # backs both the bare-name and the `alias.attr` resolution.
        local_binds: dict[str, object] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                names.add(node.id)
            elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
                attrs.add((node.value.id, node.attr))
            elif isinstance(node, ast.ImportFrom):
                base = _resolve_import_module(mod, node.module, node.level)
                if base is None:
                    continue
                for alias in node.names:
                    obj = getattr(base, alias.name, None)
                    if obj is not None:
                        local_binds[alias.asname or alias.name] = obj
            elif isinstance(node, ast.Import):
                for alias in node.names:
                    m = sys.modules.get(alias.name)
                    if m is not None and alias.name.startswith(_PKG):
                        local_binds[alias.asname or alias.name.split(".")[0]] = (
                            m if alias.asname else sys.modules.get(alias.name.split(".")[0], m)
                        )
        for n in sorted(names):
            obj = g.get(n) if n not in local_binds else local_binds[n]
            if obj is None:
                continue
            if inspect.isfunction(obj) or inspect.isclass(obj):
                if (getattr(obj, "__module__", "") or "").startswith(_PKG):
                    stack.append(obj)
            elif type(obj) in (types.ModuleType,):
                continue
            elif (
                isinstance(obj, _CONST_TYPES)
                and n.isupper()  # constants by convention; lowercase
                # module state (session memos etc.) mutates at runtime
                # and would make the hash depend on execution order
                and g.get("__name__", "").startswith(_PKG)
            ):
                tok = _const_token(obj)
                if tok is not None:
                    consts[f"{g.get('__name__')}.{n}"] = tok
        for mname, attr in sorted(attrs):
            m = local_binds.get(mname, g.get(mname))
            if isinstance(m, types.ModuleType) and m.__name__.startswith(_PKG):
                obj = getattr(m, attr, None)
                if inspect.isfunction(obj) or inspect.isclass(obj):
                    stack.append(obj)
                elif isinstance(obj, _CONST_TYPES) and attr.isupper():
                    tok = _const_token(obj)
                    if tok is not None:
                        consts[f"{m.__name__}.{attr}"] = tok
    seen.pop(f"{root.__module__}.{root.__qualname__}", None)  # helpers only
    return seen, consts


def helpers_fingerprint(fn) -> str:
    """Hash of the op's transitive helper closure: sorted
    (qualname, ast-hash) pairs for package functions/classes plus
    sorted (name, canonical-repr) pairs for plain-data constants."""
    seen, consts = _closure_refs(fn)
    items = []
    for key in sorted(seen):
        try:
            items.append((key, fn_fingerprint(seen[key])))
        except (OSError, TypeError, SyntaxError):
            items.append((key, "unsourceable"))
    items.extend(sorted(consts.items()))
    blob = json.dumps(items, sort_keys=False).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def current_fingerprints() -> dict[str, list[str]]:
    """{op: [src_fp, oracle_fp, helpers_fp]} for the registry
    importable right now."""
    from trip_data_pipeline_spark.registry import OPS, queries

    queries()  # force operator-module registration
    return {
        name: [
            fn_fingerprint(o.fn),
            oracle_fingerprint(o.oracle),
            helpers_fingerprint(o.fn),
        ]
        for name, o in OPS.items()
    }


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
            # Run THIS file's --dump with cwd at the old worktree: the
            # package resolves from cwd (front of sys.path in --dump
            # mode), while the fingerprint logic — including the
            # round-13 helper-closure walk — is always the current
            # tree's single implementation, so at-stamp and current
            # fingerprints can never diverge by tool-version skew.
            env = dict(os.environ, PYTHONPATH="")
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--dump"],
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
        # Resolve the package from cwd FIRST (fingerprints_at runs this
        # mode with cwd at a checked-out historical worktree).
        sys.path.insert(0, os.getcwd())
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
            labels = ("fn", "oracle", "helpers")
            for i, lab in enumerate(labels):
                a = v["at_stamp"][i] if i < len(v["at_stamp"]) else None
                b = v["current"][i] if i < len(v["current"]) else None
                if a != b:
                    kind.append(lab)
        print(f"  r{v['stamp_round']}  {n}  [{'+'.join(kind)}]")


if __name__ == "__main__":
    main()
