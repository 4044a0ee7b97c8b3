#!/usr/bin/env python
"""Derive the modified-since-proven query list from git (round-13 tool).

The driver-proven ledger (`registry/_proven.py`) records "ever
driver-proven", not "proven at this code state" — so after a round that
edits query bodies (e.g. the r12 adversarial-sweep guard fixes), the
ledger alone cannot tell the driver window to RE-prove the touched
queries (VERDICT r12 "What's wrong" #2).  This tool closes that gap
mechanically: it diffs two commits, maps changed line ranges in the
registry chunks to their enclosing @register bodies, and prints the
query names whose Spark plan or oracle SQL changed.  Paste the output
into `MODIFIED_SINCE_PROVEN` in `registry/_proven.py` so
`ordered_queries()` fronts them into the next driver window.

Engine-module changes (llm/, functions/, operators/, sources/) are
reported as file names — queries calling into them need manual mapping
(grep the module name in registry/) — but registry-body changes, which
is where every r12/r13 fix landed, map automatically.

Usage: python tools_modified_queries.py <base-commit> [head-commit]

With no head-commit the diff runs against the WORKING TREE, so
uncommitted edits are caught too — this is the mode
tests/test_contract.py::test_modified_since_proven_fronted uses to
enforce the invariant per edit.
"""

from __future__ import annotations

import re
import subprocess
import sys


def changed_hunks(base: str, head: str | None) -> dict[str, list[int]]:
    """path -> list of changed line numbers (new-side) from git diff.
    head=None diffs base against the working tree (uncommitted edits
    included)."""
    spec = f"{base}..{head}" if head else base
    out = subprocess.run(
        ["git", "diff", "--unified=0", spec, "--", "*.py"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout
    path, hits = None, {}
    for line in out.splitlines():
        if line.startswith("+++ b/"):
            path = line[6:]
        elif line.startswith("@@") and path:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            if m:
                start = int(m.group(1))
                count = int(m.group(2) or "1")
                hits.setdefault(path, []).extend(
                    range(start, start + max(count, 1))
                )
    return hits


def register_spans(path: str, head: str | None) -> list[tuple[str, int, int]]:
    """(query_name, first_line, last_line) for every @register body in
    the file at `head` (None = working tree) — a body spans from its
    @register line to the line before the next @register (or EOF)."""
    if head:
        src = subprocess.run(
            ["git", "show", f"{head}:{path}"],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        ).stdout.splitlines()
    else:
        with open(f"/root/repo/{path}", encoding="utf-8") as fh:
            src = fh.read().splitlines()
    starts = []
    for i, line in enumerate(src, 1):
        m = re.match(r"@register\(\s*$|@register\(\s*\"([a-z0-9_]+)\"", line)
        if line.startswith("@register("):
            # name is on this line or the next
            nm = re.search(r"\"([a-z0-9_]+)\"", line) or re.search(
                r"\"([a-z0-9_]+)\"", src[i] if i < len(src) else ""
            )
            if nm:
                starts.append((nm.group(1), i))
        # ORACLES["name"] = ... attachments count as that query's body
        m2 = re.match(r"ORACLES\[\"([a-z0-9_]+)\"\]", line)
        if m2:
            starts.append((m2.group(1), i))
    spans = []
    for j, (name, s) in enumerate(starts):
        e = starts[j + 1][1] - 1 if j + 1 < len(starts) else len(src)
        spans.append((name, s, e))
    return spans


def main() -> None:
    base = sys.argv[1]
    head = sys.argv[2] if len(sys.argv) > 2 else None
    hunks = changed_hunks(base, head)
    touched: set[str] = set()
    other: set[str] = set()
    for path, lines in hunks.items():
        if re.match(r"dicomdb_spark/registry/q\d+\.py$", path):
            spans = register_spans(path, head)
            for ln in lines:
                for name, s, e in spans:
                    if s <= ln <= e:
                        touched.add(name)
                        break
        elif path.startswith("dicomdb_spark/"):
            other.add(path)
    for name in sorted(touched):
        print(name)
    if other:
        print("# engine modules changed (map to queries manually):",
              file=sys.stderr)
        for p in sorted(other):
            print(f"#   {p}", file=sys.stderr)


if __name__ == "__main__":
    main()
