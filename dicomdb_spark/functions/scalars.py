"""Scalar column-expression library (SURVEY.md §2 F1–F9).

Everything here is built from ``pyspark.sql.functions`` — no Python
UDFs — so each function stays inside whole-stage codegen and remains
expressible as ANSI SQL for the DuckDB oracle (SURVEY §2 U2: these are
exactly the functions that *should not* be UDFs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — accent folding table from the reference sanitizer
# (do_common.py:238-287): é è ê ë → e, à â ä → a, ô ö → o, î ï → i,
# ù û ü → u, ç → c, µ → m.
_ACCENT_SRC = "éèêëàâäôöîïùûüçµÉÈÊËÀÂÄÔÖÎÏÙÛÜÇ"
_ACCENT_DST = "eeeeaaaooiiuuucmEEEEAAAOOIIUUUC"


def alpha_num_str(col: Column | str) -> Column:
    """F1 — the reference's ``alpha_num_str`` sanitizer as pure exprs.

    accent-fold → ``/``→``_`` → non-word→``_`` → collapse ``__`` →
    strip leading/trailing ``_`` (do_common.py:238-287).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _ACCENT_SRC, _ACCENT_DST)
    c = F.regexp_replace(c, r"[^A-Za-z0-9]", "_")
    c = F.regexp_replace(c, r"_+", "_")
    c = F.regexp_replace(c, r"^_|_$", "")
    return c


def ta_seconds(col: Column | str) -> Column:
    """F5 — Siemens ``TA mm:ss*N`` / ``TA mm.ss*N`` → total seconds.

    Reference parse (Exam_info.py:1470-1487): ``mm:ss`` → mm*60+ss;
    ``mm.ss`` (dotted form) → mm+1 minutes; trailing ``*N`` multiplies.
    Pure regexp_extract + arithmetic.
    """
    c = F.col(col) if isinstance(col, str) else col
    mm = F.regexp_extract(c, r"TA\s+(\d+)[:.](\d+)(?:\*(\d+))?", 1)
    ss = F.regexp_extract(c, r"TA\s+(\d+)[:.](\d+)(?:\*(\d+))?", 2)
    mult = F.regexp_extract(c, r"TA\s+(\d+)[:.](\d+)(?:\*(\d+))?", 3)
    dotted = c.rlike(r"TA\s+\d+\.\d+")
    base = F.when(
        dotted, (mm.cast("long") + 1) * 60
    ).otherwise(mm.cast("long") * 60 + ss.cast("long"))
    m = F.when(mult == "", F.lit(1)).otherwise(mult.cast("long"))
    return F.when(mm == "", F.lit(None).cast("long")).otherwise(base * m)


def time_str_to_sec(col: Column | str) -> Column:
    """F4 — ``HHMMSS``-style string → seconds of day (Exam_info.py:1669).

    try_cast so malformed raw DICOM time strings yield NULL instead of
    failing the job under ANSI mode (Spark 4 default) — the reference
    tolerated garbage headers and so must we.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.substring(c, 1, 2).try_cast("long") * 3600
        + F.substring(c, 3, 2).try_cast("long") * 60
        + F.substring(c, 5, 2).try_cast("long")
    )


def seconds_of_day(ts: Column | str) -> Column:
    """F4 — MySQL time_to_sec(): h*3600+m*60+s of a timestamp."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (
        F.hour(c).cast("long") * 3600 + F.minute(c).cast("long") * 60 + F.second(c).cast("long")
    )


def duration_with_rollover(start_sec: Column, end_sec: Column) -> Column:
    """F4 — end-start with midnight rollover (+24h when negative).

    Exam_info.py:224-225,856-857.
    """
    d = end_sec - start_sec
    return F.when(d < 0, d + 24 * 3600).otherwise(d)


def ceil_minutes(seconds: Column) -> Column:
    """F4 — ``ceil(sec/60)`` minutes (Exam_info.py:206, Cenir_DB.py:863)."""
    return F.ceil(seconds / 60.0).cast("long")


def prefix_code(col: Column | str, prefix_map: Sequence[tuple[str, int]], default: int = 0) -> Column:
    """F2 — startswith-dispatch to an integer code.

    The reference's machine→rid map: Verio→19, TrioTim/Prisma_fit→1,
    SIGNA→29, Bruker→39, MAGNETOM Cima→80, Terra.X→82
    (Exam_info.py:262-274, do_dicom.py:533-544).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(default)
    for prefix, code in reversed(list(prefix_map)):
        expr = F.when(c.startswith(prefix), F.lit(code)).otherwise(expr)
    return expr


def classify_contains(
    col: Column | str,
    rules: Sequence[tuple[str, str]],
    default: str = "to_be_defined",
) -> Column:
    """F8 — the SeqType classifier shape: first-matching-substring wins.

    Reference dispatch: ep_b→DWI, epfid→EPI, spc3d→SPACE3D,
    tfl3d→MPRAGE, fm2d2r→GreFieldMap, ... (Exam_info.py:293-344).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column = F.lit(default)
    for needle, label in reversed(list(rules)):
        expr = F.when(c.contains(needle), F.lit(label)).otherwise(expr)
    return expr


def coalesce_chain(*cols: Column | str, default: str | None = None) -> Column:
    """F6 — fallback chains (AcquisitionDate else StudyDate, ...;
    Exam_info.py:172-180).  NULL-sentinel strings should be turned to
    real nulls with ``nullif`` before entering the chain (§1.3)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if default is not None:
        cs.append(F.lit(default))
    return F.coalesce(*cs)


def float_tolerant_eq(a: Column | str, b: Column | float) -> Column:
    """P4 — round(x*1e5) equality, the reference's float comparison
    (Cenir_DB.py:938).  Preserved exactly for change-detection parity."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.lit(b) if isinstance(b, (int, float)) else b
    return F.round(ca * 100000) == F.round(cb * 100000)


def replace_map(col: Column | str, mapping: dict[str, str]) -> Column:
    """F2 — exact-value normalization map (the reference's MachineName
    fix "Ox Offline Recon" → "SIGNA PET/MR", Exam_info.py:151-152)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = c
    for src, dst in mapping.items():
        expr = F.when(c == src, F.lit(dst)).otherwise(expr)
    return expr
