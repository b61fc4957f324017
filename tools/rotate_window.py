"""Diff-driven driver-window rotation.

The driver's correctness harness checks only the FIRST 50 entries of
`__spark_entry__.queries()`. Round 5 shipped a code change to q80 while
q80 sat below the cutoff — its driver record stayed round-3 even though
its physical plan changed (the round-5 VERDICT "What's wrong #2"). The
rule this tool enforces: **a query whose code path changed since its
last driver record must be inside the window.**

Selection = FLAGSHIPS ∪ CHANGED ∪ STALEST-fill, where

- FLAGSHIPS are the pinned always-in-window composites;
- CHANGED is computed from `git diff --name-only <base>..HEAD`:
  * a changed operator/package module selects every query whose function
    body references it (AST scan of __spark_entry__.py import aliases and
    attribute usage, plus each query's `from esper_tv_spark...` imports);
  * a changed `__spark_entry__.py` is resolved per-FUNCTION: diff hunks
    are mapped to enclosing module-level defs, and helper changes
    propagate to queries through the module call graph (so touching
    `_parquet_list_dim` selects every query that calls it, but an
    unrelated query's docstring edit selects only that query);
- STALEST-fill orders the remainder by the round of their newest green
  CORRECTNESS_r*.json row (oldest record first) so records keep
  refreshing even without code churn.

`<base>` defaults to the newest commit whose subject matches the
driver's end-of-round artifact commit ("round N: verdict/..."), i.e. the
code as the previous round's records saw it.

Usage:
    python tools/rotate_window.py [--base <commit>] [--apply]

Without --apply it prints the proposed window and exits 1 if the current
registry order violates the rule (a changed query sits below the
cutoff). With --apply it rewrites the `_QUERIES = {` literal in
__spark_entry__.py in the proposed order (comments inside the dict are
dropped; a generated header comment states the rule).
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")
WINDOW = 50

# always-in-window composites: the flagship + the deepest/most
# scale-sensitive operators (one per family)
FLAGSHIPS = [
    "q08_weighted_screen_time",
    "q56_commercial_detection",
    "q85_semantic_dedup",
    "q51_near_dup_embeddings",
    "q37_jaccard_verify",
    "q28_minhash_lsh_pairs",
]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def default_base() -> str:
    log = _git("log", "--format=%H %s", "-200")
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        if re.match(r"round \d+: verdict", subj):
            return sha
    # fall back to the root commit
    return _git("rev-list", "--max-parents=0", "HEAD").split()[0]


def registry_order() -> list[str]:
    """Query names in current _QUERIES order (AST, no import)."""
    tree = ast.parse(open(ENTRY).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "_QUERIES":
            return [ast.literal_eval(k) for k in node.value.keys]
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", "") == "_QUERIES" for t in node.targets
        ):
            return [ast.literal_eval(k) for k in node.value.keys]
    raise RuntimeError("_QUERIES literal not found")


def _module_files() -> dict[str, str]:
    """alias/module-name -> repo-relative file, for esper_tv_spark modules."""
    out = {}
    for path in glob.glob(os.path.join(REPO, "esper_tv_spark", "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, REPO)
        mod = rel[:-3].replace(os.sep, ".")
        out[mod] = rel
    return out


def entry_function_map() -> dict[str, tuple[int, int]]:
    """module-level def name -> (first line, last line) in __spark_entry__."""
    tree = ast.parse(open(ENTRY).read())
    return {
        n.name: (n.lineno, n.end_lineno)
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }


def entry_deps() -> tuple[dict[str, set[str]], dict[str, set[str]]]:
    """For each module-level function in __spark_entry__:
    (names of other module-level functions it references,
     esper_tv_spark module files its body imports/uses)."""
    src = open(ENTRY).read()
    tree = ast.parse(src)
    mod_files = _module_files()
    top_names = {
        n.name for n in tree.body if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    # module-level import aliases (import ... as sim / from x import y)
    alias_to_file: dict[str, str] = {}
    for n in tree.body:
        if isinstance(n, ast.Import):
            for a in n.names:
                if a.name in mod_files:
                    alias_to_file[a.asname or a.name.split(".")[0]] = mod_files[a.name]
        elif isinstance(n, ast.ImportFrom) and n.module and n.module.startswith("esper_tv_spark"):
            for a in n.names:
                full = f"{n.module}.{a.name}"
                target = mod_files.get(full, mod_files.get(n.module))
                if target:
                    alias_to_file[a.asname or a.name] = target

    calls: dict[str, set[str]] = {}
    mods: dict[str, set[str]] = {}
    for n in tree.body:
        if not isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        used_fns: set[str] = set()
        used_mods: set[str] = set()
        for sub in ast.walk(n):
            if isinstance(sub, ast.Name) and sub.id in top_names and sub.id != n.name:
                used_fns.add(sub.id)
            if isinstance(sub, ast.Name) and sub.id in alias_to_file:
                used_mods.add(alias_to_file[sub.id])
            if isinstance(sub, ast.ImportFrom) and sub.module and sub.module.startswith(
                "esper_tv_spark"
            ):
                for a in sub.names:
                    full = f"{sub.module}.{a.name}"
                    target = mod_files.get(full, mod_files.get(sub.module))
                    if target:
                        used_mods.add(target)
            if isinstance(sub, ast.Import):
                for a in sub.names:
                    if a.name in mod_files:
                        used_mods.add(mod_files[a.name])
        calls[n.name] = used_fns
        mods[n.name] = used_mods
    return calls, mods


def _package_closure(changed_files: set[str]) -> set[str]:
    """Changed esper_tv_spark files + files that import a changed module
    (one transitive sweep: operators compose, e.g. dedup uses similarity)."""
    mod_files = _module_files()
    file_to_mod = {v: k for k, v in mod_files.items()}
    changed = {f for f in changed_files if f in file_to_mod}
    for _ in range(5):
        grew = False
        for mod, rel in mod_files.items():
            if rel in changed:
                continue
            try:
                tree = ast.parse(open(os.path.join(REPO, rel)).read())
            except SyntaxError:
                continue
            imports: set[str] = set()
            for n in ast.walk(tree):
                if isinstance(n, ast.Import):
                    imports.update(a.name for a in n.names)
                elif isinstance(n, ast.ImportFrom) and n.module:
                    imports.add(n.module)
                    imports.update(f"{n.module}.{a.name}" for a in n.names)
            if any(mod_files.get(i) in changed for i in imports if i in mod_files):
                changed.add(rel)
                grew = True
        if not grew:
            break
    return changed


def changed_queries(base: str) -> set[str]:
    diff_files = set(_git("diff", "--name-only", f"{base}..HEAD").split())
    queries = [q for q in registry_order()]
    calls, mods = entry_deps()
    fn_lines = entry_function_map()

    # 1) operator-package changes (with one import-transitive sweep)
    pkg_changed = _package_closure(diff_files)

    # 2) entry-file changes resolved per function via diff hunks
    touched_fns: set[str] = set()
    if "__spark_entry__.py" in diff_files:
        hunks = _git("diff", "-U0", f"{base}..HEAD", "--", "__spark_entry__.py")
        for m in re.finditer(r"^@@ .* \+(\d+)(?:,(\d+))? @@", hunks, re.M):
            start = int(m.group(1))
            count = int(m.group(2) or "1")
            lo, hi = start, start + max(count - 1, 0)
            for fn, (a, b) in fn_lines.items():
                if a <= hi and b >= lo:
                    touched_fns.add(fn)

    # propagate helper changes through the entry call graph (fixpoint)
    affected_fns = set(touched_fns)
    for _ in range(10):
        grew = False
        for fn, deps in calls.items():
            if fn not in affected_fns and deps & affected_fns:
                affected_fns.add(fn)
                grew = True
        if not grew:
            break

    out: set[str] = set()
    for q in queries:
        if q in affected_fns:
            out.add(q)
            continue
        if mods.get(q, set()) & pkg_changed:
            out.add(q)
            continue
        # helper functions this query calls may use changed modules
        seen: set[str] = set()
        stack = list(calls.get(q, ()))
        while stack:
            h = stack.pop()
            if h in seen:
                continue
            seen.add(h)
            if mods.get(h, set()) & pkg_changed or h in affected_fns:
                out.add(q)
                break
            stack.extend(calls.get(h, ()))
    return out


def record_round() -> dict[str, int]:
    """query -> newest round with a green CORRECTNESS row (0 = never)."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for q, row in data.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("schema_match"):
                out[q] = max(out.get(q, 0), rnd)
    return out


def propose(base: str) -> tuple[list[str], set[str]]:
    order = registry_order()
    changed = changed_queries(base)
    rounds = record_round()
    window: list[str] = [q for q in FLAGSHIPS if q in order]
    for q in order:
        if q in changed and q not in window:
            window.append(q)
    # stalest-record fill, ties broken by current registry position
    pos = {q: i for i, q in enumerate(order)}
    rest = sorted(
        (q for q in order if q not in window), key=lambda q: (rounds.get(q, 0), pos[q])
    )
    for q in rest:
        if len(window) >= WINDOW:
            break
        window.append(q)
    tail = [q for q in order if q not in window]
    return window + tail, changed


def apply_order(new_order: list[str]) -> None:
    src = open(ENTRY).read()
    m = re.search(
        r"_QUERIES: dict\[str, Callable\[\[SparkSession, str\], DataFrame\]\] = \{.*?\n\}\n",
        src,
        re.S,
    )
    if not m:
        raise RuntimeError("_QUERIES literal not found for rewrite")
    lines = [
        "_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {",
        "    # ORDER GENERATED by tools/rotate_window.py — the driver checks only",
        "    # the first 50 entries; the window is flagships + every query whose",
        "    # code path changed since its last driver record (git-diff-driven,",
        "    # see the tool's docstring) + stalest-record fill.",
    ]
    for i, q in enumerate(new_order):
        if i == WINDOW:
            lines.append("    # ---- position 50 cutoff: rows below hold a prior-round green")
            lines.append("    # ---- record on code paths unchanged since (rule enforced above)")
        lines.append(f'    "{q}": {q},')
    lines.append("}")
    open(ENTRY, "w").write(src[: m.start()] + "\n".join(lines) + "\n" + src[m.end() :])


def main() -> int:
    base = default_base()
    apply = "--apply" in sys.argv
    if "--base" in sys.argv:
        base = sys.argv[sys.argv.index("--base") + 1]
    new_order, changed = propose(base)
    cur = registry_order()
    cur_window = set(cur[:WINDOW])
    missing = sorted(q for q in changed if q not in cur_window)
    print(f"base: {base[:12]}")
    print(f"changed queries ({len(changed)}): {' '.join(sorted(changed)) or '(none)'}")
    if missing:
        print(f"RULE VIOLATION — changed but below the cutoff: {' '.join(missing)}")
    if apply:
        apply_order(new_order)
        print(f"applied: window rewritten ({len(new_order)} queries, cutoff {WINDOW})")
        return 0
    print("proposed window:")
    for i, q in enumerate(new_order[:WINDOW]):
        mark = "*" if q in changed else " "
        print(f"  {i + 1:2d} {mark} {q}")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
