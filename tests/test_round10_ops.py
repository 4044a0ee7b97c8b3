"""Round-10 ADVICE fixes: DTW degenerate guard, ktruss self-certifying
convergence flag, variance-ratio integer-scaled moment sums."""

from __future__ import annotations

from pyspark.sql import functions as F

from dicomdb_spark.io import load_table
from dicomdb_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_dtw_degenerate_single_type_is_empty(spark, tmp_path):
    """With fewer than two distinct event_types both DTW variants must
    return an EMPTY result (round-9 ADVICE: the null pivot column used
    to silently diverge from the oracle's same-list-twice behavior).
    Build a one-type events fixture and run the real registry entries
    against it."""
    one = (
        load_table(spark, SF, "events")
        .withColumn("event_type", F.lit("only_type"))
    )
    d = str(tmp_path / "sf_onetype")
    one.write.parquet(d + "/events.parquet")
    assert QUERIES["w_dtw_distance"](spark, d).count() == 0
    assert QUERIES["w_dtw_banded"](spark, d).count() == 0


def test_dtw_normal_path_unchanged(spark):
    """The guard must not perturb the >=2-type path: one non-empty row
    with the documented calendar-day envelope."""
    rows = QUERIES["w_dtw_distance"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_a_days >= 1 and r.n_b_days >= 1
    assert r.n_a_days * r.n_b_days <= 31 * 31  # docstring cost envelope
    assert r.dtw >= 0.0


def test_ktruss_converged_flag_self_certifies(spark):
    """`converged` must equal (round-5 edge count == round-6 edge
    count) — computed from the output itself, not from a fixture
    assumption — and be constant across rows."""
    rows = QUERIES["graph_ktruss_fixpoint"](spark, SF).collect()
    by_round = {r.round: r for r in rows}
    assert set(by_round) == set(range(7))
    want = int(by_round[5].n_edges == by_round[6].n_edges)
    assert all(r.converged == want for r in rows)
    # the shipped fixture does converge; the flag should say so
    assert want == 1
    # final round is at_fixpoint by construction; converged is the
    # honest signal
    assert by_round[6].at_fixpoint == 1


def test_variance_ratio_matches_integer_scaled_recomputation(spark):
    """Brute-force the floor-scaled Lo–MacKinlay statistic in Python
    (exact int sums of floor(dy^2/1e4)) and compare bitwise."""
    ev = load_table(spark, SF, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
        .orderBy("day")
        .collect()
    )
    ys = [r.y for r in daily]
    dy = [b - a for a, b in zip(ys, ys[1:])]
    n = len(dy)
    s = sum(dy)
    s2s = sum(int((float(d) * float(d)) / 10000.0) for d in dy)
    blocks = [dy[i : i + 5] for i in range(0, n - n % 5, 5)] if n else []
    # query blocks are (rn-2)//5 over rn starting at 2 -> aligned at 0
    s5 = [sum(b) for b in blocks if len(b) == 5]
    nb = len(s5)
    sb = sum(s5)
    sb2s = sum(int((float(v) * float(v)) / 10000.0) for v in s5)
    var1 = s2s * 10000.0 / n - (s / n) * (s / n)
    var5 = sb2s * 10000.0 / nb - (sb / nb) * (sb / nb)
    want = var5 / (5.0 * var1)
    row = QUERIES["w_variance_ratio"](spark, SF).collect()[0]
    assert row.n_diffs == n and row.n_blocks == nb
    assert row.vr_5 == want


# ------------------------------------------------------ real decode
def test_stdlib_decoder_parses_known_container_bytes():
    """Hand-built container headers with known dimensions — including
    cases the synthetic fixture never produces (BITMAPCOREHEADER,
    top-down BMP, JPEG with APP0 before SOF, progressive SOF2,
    GIF87a) — must parse exactly; garbage must hit the fallback."""
    import struct

    from dicomdb_spark.llm.multimodal import build_container, stdlib_decoder

    png = build_container(4, b"body")  # 4 % 4 == 0 -> PNG, w=5, h=29
    assert stdlib_decoder(png) == {
        "format": "image/png", "width": 5, "height": 29,
    }
    gif87 = b"GIF87a" + struct.pack("<HH", 320, 200) + bytes(3)
    assert stdlib_decoder(gif87) == {
        "format": "image/gif", "width": 320, "height": 200,
    }
    # top-down BMP stores a NEGATIVE height
    bmp = (
        b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 17, -9, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    assert stdlib_decoder(bmp) == {
        "format": "image/bmp", "width": 17, "height": 9,
    }
    core_bmp = (
        b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
        + struct.pack("<IHHHH", 12, 7, 3, 1, 24)
    )
    assert stdlib_decoder(core_bmp) == {
        "format": "image/bmp", "width": 7, "height": 3,
    }
    # JPEG with an APP0/JFIF segment before a progressive SOF2 frame
    jfif = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        + b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 480, 640, 1) + bytes(3)
    )
    assert stdlib_decoder(jfif) == {
        "format": "image/jpeg", "height": 480, "width": 640,
    }
    # DHT (C4) must be SKIPPED by the SOFn walk, not read as a frame
    dht_first = (
        b"\xff\xd8"
        + b"\xff\xc4" + struct.pack(">H", 4) + bytes(2)
        + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 2, 3, 1) + bytes(3)
    )
    assert stdlib_decoder(dht_first) == {
        "format": "image/jpeg", "height": 2, "width": 3,
    }
    # truncated JPEG: format known, dims unknown
    assert stdlib_decoder(b"\xff\xd8\xff") == {
        "format": "image/jpeg", "width": None, "height": None,
    }
    for junk in (b"", b"plain text", b"\x89PNGbut-not-really", b"BMx"):
        assert stdlib_decoder(junk)["format"] == "application/octet-stream"


def test_containerize_roundtrip_all_four_formats(spark):
    """containerize -> stdlib_decoder must recover the doc_id-derived
    dimensions for every container class in the fixture."""
    from dicomdb_spark.llm import multimodal as mm

    docs = load_table(spark, SF, "documents").limit(64)
    out = mm.decode_image_meta(mm.containerize(docs)).collect()
    assert len(out) == 64
    fmts = {"image/png", "image/gif", "image/bmp", "image/jpeg"}
    assert {r.format for r in out} == fmts
    for r in out:
        assert r.width == (r.doc_id % 1024) + 1
        assert r.height == ((r.doc_id * 7) % 1024) + 1


def test_hoeffding_d_matches_brute_force_midranks(spark):
    """Recompute Hoeffding's D from the textbook definition with
    quadrant midranks (fractional, float) and compare the query's
    integer-encoded path bitwise; also pin the expected positive
    dependence between daily count and daily total."""
    ev = load_table(spark, SF, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("y"),
        )
        .collect()
    )
    pts = [(r.x, r.y) for r in daily]
    n = len(pts)
    d1_16 = d2_16 = d3_16 = 0
    for xi, yi in pts:
        c_lt_x = sum(1 for xj, _ in pts if xj < xi)
        c_eq_x = sum(1 for xj, _ in pts if xj == xi) - 1
        c_lt_y = sum(1 for _, yj in pts if yj < yi)
        c_eq_y = sum(1 for _, yj in pts if yj == yi) - 1
        c_ll = sum(1 for xj, yj in pts if xj < xi and yj < yi)
        c_el = sum(1 for xj, yj in pts if xj == xi and yj < yi)
        c_le = sum(1 for xj, yj in pts if xj < xi and yj == yi)
        c_ee = sum(1 for xj, yj in pts if xj == xi and yj == yi) - 1
        r2 = 2 * c_lt_x + c_eq_x + 2
        s2 = 2 * c_lt_y + c_eq_y + 2
        q4 = 4 * c_ll + 2 * (c_el + c_le) + c_ee + 4
        d1_16 += (q4 - 4) * (q4 - 8)
        d2_16 += (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)
        d3_16 += (r2 - 4) * (s2 - 4) * (q4 - 4)
    nd = float(n)
    want = (
        30.0
        * ((nd - 2.0) * (nd - 3.0) * float(d1_16) + float(d2_16)
           - 2.0 * (nd - 2.0) * float(d3_16))
        / (16.0 * nd * (nd - 1.0) * (nd - 2.0) * (nd - 3.0) * (nd - 4.0))
    )
    row = QUERIES["a_hoeffding_d"](spark, SF).collect()[0]
    assert row.n_days == n
    assert (row.d1_16, row.d2_16, row.d3_16) == (d1_16, d2_16, d3_16)
    assert row.hoeffding_d == want
    # count and total are strongly positively dependent by construction
    assert row.hoeffding_d > 0.0


def test_kll_sketch_matches_bruteforce_compaction(spark):
    """The closed-form survivor rule (positions == 1 mod 2^L of the
    sorted stream) must equal an explicit level-by-level odd-keeping
    compaction, and every decile probe must satisfy the 0 <= est -
    true < 2^L guarantee."""
    import duckdb

    con = duckdb.connect()
    vals = [
        r[0]
        for r in con.execute(
            "SELECT CAST(floor(l_extendedprice*100) AS BIGINT) FROM "
            f"'{SF}/lineitem.parquet'"
        ).fetchall()
    ]
    vals.sort()
    n, k = len(vals), 64
    # explicit cascade: keep odd (1-indexed) positions until <= k remain
    level, L = vals[:], 0
    while len(level) > k:
        level = level[::2]
        L += 1
    rows = QUERIES["sketch_kll_quantiles"](spark, SF).collect()
    assert len(rows) == 9
    for r in rows:
        assert r.n == n and r.two_l == 2**L
        true_rank = sum(1 for v in vals if v < r.probe_cents)
        est = (2**L) * sum(1 for v in level if v < r.probe_cents)
        assert r.true_rank == true_rank and r.est_rank == est
        assert 0 <= r.rank_err < 2**L and r.within_bound == 1
    # survivors of the cascade ARE the closed-form positions
    assert level == vals[:: 2**L]


def _bars_py(sf=SF):
    """Python replay of the q05 bars grain: {type: [(day, vol, p, hi, lo)]}."""
    import duckdb
    from collections import defaultdict

    rows = duckdb.connect().execute(
        "SELECT event_type, CAST(ts AS DATE), count(*), "
        "SUM(CAST(floor(value*100) AS BIGINT)), "
        "MAX(CAST(floor(value*100) AS BIGINT)), "
        "MIN(CAST(floor(value*100) AS BIGINT)) "
        f"FROM '{sf}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    out = defaultdict(list)
    for t, day, vol, p, hi, lo in rows:
        out[t].append((day, int(vol), int(p), int(hi), int(lo)))
    return out


def test_jain_fano_bruteforce(spark):
    import duckdb

    counts = duckdb.connect().execute(
        "SELECT event_type, user_id, count(*) FROM "
        f"'{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for t, _, c in counts:
        per[t].append(int(c))
    jain = {r.event_type: r for r in QUERIES["a_jains_fairness"](spark, SF).collect()}
    assert set(jain) == set(per)
    for t, xs in per.items():
        s, ss, n = sum(xs), sum(x * x for x in xs), len(xs)
        r = jain[t]
        assert (r.n_users, r.sum_c, r.sum_cc) == (n, s, ss)
        assert r.jain == (float(s) * float(s)) / (float(n) * float(ss))
        assert 1.0 / n <= r.jain <= 1.0
    fano = {r.event_type: r for r in QUERIES["a_fano_factor"](spark, SF).collect()}
    for t, bars in _bars_py().items():
        vs = [v for _, v, _, _, _ in bars]
        n, s, ss = len(vs), sum(vs), sum(v * v for v in vs)
        r = fano[t]
        assert (r.n_days, r.sum_v, r.sum_vv) == (n, s, ss)
        assert r.fano == float(n * ss - s * s) / float(n * s)


def test_oscillators_bruteforce(spark):
    bars = _bars_py()
    cmo = {r.event_type: r for r in QUERIES["w_chande_momentum"](spark, SF).collect()}
    vtx = {r.event_type: r for r in QUERIES["w_vortex_indicator"](spark, SF).collect()}
    uo = {r.event_type: r for r in QUERIES["w_ultimate_oscillator"](spark, SF).collect()}
    for t, b in bars.items():
        ps = [p for _, _, p, _, _ in b]
        ch = [b1 - b0 for b0, b1 in zip(ps, ps[1:])]
        su, sd = sum(c for c in ch if c > 0), sum(-c for c in ch if c < 0)
        if su + sd > 0:
            r = cmo[t]
            assert (r.su, r.sd) == (su, sd)
            assert r.cmo == 100.0 * float(su - sd) / float(su + sd)
        vm_p = vm_m = s_tr = 0
        bps, trs = [], []
        for (d0, _, p0, h0, l0), (d1, _, p1, h1, l1) in zip(b, b[1:]):
            vm_p += abs(h1 - l0)
            vm_m += abs(l1 - h0)
            s_tr += max(h1 - l1, abs(h1 - p0), abs(l1 - p0))
            bps.append(p1 - min(l1, p0))
            trs.append(max(h1, p0) - min(l1, p0))
        if s_tr > 0:
            r = vtx[t]
            assert (r.sum_vm_plus, r.sum_vm_minus, r.sum_tr) == (vm_p, vm_m, s_tr)
            assert r.vi_plus == float(vm_p) / float(s_tr)
        if len(bps) >= 28 and all(sum(trs[-k:]) > 0 for k in (7, 14, 28)):
            r = uo[t]
            b7, t7 = sum(bps[-7:]), sum(trs[-7:])
            b14, t14 = sum(bps[-14:]), sum(trs[-14:])
            b28, t28 = sum(bps[-28:]), sum(trs[-28:])
            assert (r.bp7, r.tr7, r.bp14, r.tr14, r.bp28, r.tr28) == (
                b7, t7, b14, t14, b28, t28,
            )
            assert r.uo == 100.0 * (
                4.0 * (float(b7) / float(t7))
                + 2.0 * (float(b14) / float(t14))
                + (float(b28) / float(t28))
            ) / 7.0
        else:
            assert t not in uo


def test_qn_scale_bruteforce(spark):
    """Qn must equal the k-th smallest pairwise |diff| of the daily
    totals, k = C(h,2), h = n//2 + 1."""
    import duckdb

    ys = [
        int(r[0])
        for r in duckdb.connect().execute(
            "SELECT SUM(CAST(floor(value*100) AS BIGINT)) FROM "
            f"'{SF}/events.parquet' GROUP BY CAST(ts AS DATE)"
        ).fetchall()
    ]
    n = len(ys)
    diffs = sorted(
        abs(a - b) for i, a in enumerate(ys) for b in ys[i + 1:]
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    r = QUERIES["a_qn_scale"](spark, SF).collect()[0]
    assert (r.n_days, r.h, r.k) == (n, h, k)
    assert r.qn_cents == diffs[k - 1]
    assert r.qn == 2.2219 * float(diffs[k - 1]) / 100.0


def test_chao1_and_cli_bruteforce(spark):
    import duckdb
    from collections import Counter, defaultdict
    import re

    rows = duckdb.connect().execute(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    freq, cli_in = defaultdict(Counter), defaultdict(lambda: [0, 0, 0])
    for src, txt in rows:
        toks = [t.lower() for t in txt.strip().split()]
        freq[src].update(toks)
        cli_in[src][0] += len(re.sub(r"[^A-Za-z]", "", txt))
        cli_in[src][1] += len(txt.strip().split())
        cli_in[src][2] += max(len(re.findall(r"[.!?]+", txt)), 1)
    chao = {r.source: r for r in QUERIES["a_chao1_richness"](spark, SF).collect()}
    for src, ctr in freq.items():
        f1 = sum(1 for c in ctr.values() if c == 1)
        f2 = sum(1 for c in ctr.values() if c == 2)
        s_obs, toks = len(ctr), sum(ctr.values())
        r = chao[src]
        assert (r.s_obs, r.tokens, r.f1, r.f2) == (s_obs, toks, f1, f2)
        assert r.chao1 == float(s_obs) + float(f1 * (f1 - 1)) / float(2 * (f2 + 1))
    cli = {r.source: r for r in QUERIES["text_coleman_liau"](spark, SF).collect()}
    for src, (L, W, S) in cli_in.items():
        r = cli[src]
        assert (r.letters, r.words, r.sentences) == (L, W, S)
        assert r.cli == 0.0588 * (100.0 * L / W) - 0.296 * (100.0 * S / W) - 15.8


def test_page_and_cucconi_bruteforce(spark):
    import duckdb
    import math
    from collections import defaultdict

    con = duckdb.connect()
    # Page's L over complete (day x type) blocks, lexicographic order
    bars = con.execute(
        "SELECT event_type, CAST(ts AS DATE), count(*) FROM "
        f"'{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    types = sorted({t for t, _, _ in bars})
    k = len(types)
    per_day = defaultdict(dict)
    for t, d, v in bars:
        per_day[d][t] = int(v)
    blocks = {d: m for d, m in per_day.items() if len(m) == k}
    l2 = 0
    for d, m in blocks.items():
        vols = sorted(m.values())
        for j, t in enumerate(types, 1):
            v = m[t]
            p = sum(1 for x in vols if x < v)
            ties = sum(1 for x in vols if x == v)
            l2 += j * (2 * (p + 1) + ties - 1)
    b = len(blocks)
    r = QUERIES["a_page_trend_test"](spark, SF).collect()[0]
    assert (r.n_blocks, r.k, r.l2) == (b, k, l2)
    assert r.e_l2 == b * k * (k + 1) * (k + 1) // 2
    # Cucconi C >= 0 and its rank sums replay
    import hashlib

    totals = con.execute(
        "SELECT user_id, SUM(CAST(floor(value) AS BIGINT)) FROM "
        f"'{SF}/events.parquet' GROUP BY 1"
    ).fetchall()
    arms = [
        (
            int(hashlib.md5(f"arm:{uid}".encode()).hexdigest()[:2], 16) % 2,
            int(x),
        )
        for uid, x in totals
    ]
    xs = sorted(x for _, x in arms)
    n = len(xs)

    def r2(v):
        p = sum(1 for x in xs if x < v)
        t = sum(1 for x in xs if x == v)
        return 2 * (p + 1) + t - 1

    s1b = sum(r2(x) for a, x in arms if a == 1)
    s2b = sum(r2(x) ** 2 for a, x in arms if a == 1)
    rq = QUERIES["a_cucconi_test"](spark, SF).collect()[0]
    assert (rq.s1b, rq.s2b) == (s1b, s2b)
    assert rq.n_a + rq.n_b == n
    assert rq.c_stat >= 0.0 and math.isfinite(rq.c_stat)


def test_renko_bruteforce(spark):
    rows = {r.event_type: r for r in QUERIES["w_renko_bricks"](spark, SF).collect()}
    for t, b in _bars_py().items():
        ys = [p for _, _, p, _, _ in b]
        bsz = max((max(ys) - min(ys)) // 10, 1)
        level, up, down = ys[0], 0, 0
        for y in ys[1:]:
            if y >= level:
                k = (y - level) // bsz
                level += k * bsz
                up += k
            else:
                k = (level - y) // bsz
                level -= k * bsz
                down += k
        r = rows[t]
        assert (r.brick_cents, r.start_level, r.final_level, r.n_up, r.n_down) == (
            bsz, ys[0], level, up, down,
        )


def test_misra_gries_bruteforce(spark):
    """Replay weighted MG (k=3) in plain Python over the canonical
    (day, type) stream; the sketch must match exactly and the
    (W - sum)/4 bound must hold for every key."""
    stream = sorted(
        (day, t, v) for t, bars in _bars_py().items() for day, v, _, _, _ in bars
    )
    ctr = {}
    for _, key, w in stream:
        if key in ctr:
            ctr[key] += w
        elif len(ctr) < 3:
            ctr[key] = w
        else:
            d = min(min(ctr.values()), w)
            ctr = {k: c - d for k, c in ctr.items() if c - d > 0}
            if w - d > 0:
                ctr[key] = w - d
    true = {}
    for _, key, w in stream:
        true[key] = true.get(key, 0) + w
    big_w, s_fin = sum(true.values()), sum(ctr.values())
    bound = (big_w - s_fin) // 4
    rows = {r.event_type: r for r in QUERIES["sketch_misra_gries"](spark, SF).collect()}
    assert set(rows) == set(true)
    for t, r in rows.items():
        assert r.true_w == true[t] and r.mg_w == ctr.get(t, 0)
        assert r.bound == bound and r.within_bound == 1
        assert 0 <= r.undercount <= bound


def _osa(a, b):
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[n][m]


def test_osa_bruteforce_and_adversarial(spark):
    import duckdb
    import re

    docs = duckdb.connect().execute(
        f"SELECT source, doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for s, i, t in docs:
        per[s].append((i, re.sub(r"[^ -~]", "", t)[:32]))
    rows = {r.source: r for r in QUERIES["dedup_osa_distance"](spark, SF).collect()}
    for s, lst in per.items():
        if len(lst) < 2:
            assert s not in rows
            continue
        a = min(lst)[1]
        b = max(lst)[1]
        if not a or not b:
            assert s not in rows
            continue
        r = rows[s]
        assert (r.len_a, r.len_b) == (len(a), len(b))
        assert r.osa == _osa(a, b)
        assert r.osa <= r.lev and r.osa_le_lev == 1
    # adversarial fixed vectors through the same python replay the
    # query's DP mirrors (transposition, tie, boundary-row cases)
    assert _osa("CA", "ABC") == 3      # OSA, not full DL (= 2)
    assert _osa("ab", "ba") == 1
    assert _osa("", "abc") == 3
    assert _osa("abcd", "abdc") == 1


def test_wav_decoder_adversarial_headers():
    """Header shapes the synthetic fixture never produces: extra
    chunks before fmt, odd-size chunk padding, truncated files,
    malformed RIFF."""
    import struct

    from dicomdb_spark.llm.multimodal import build_wav, wav_decoder

    w = wav_decoder(build_wav(7, b"x" * 100))
    assert w == {
        "format": "audio/wav", "channels": 2, "sample_rate": 24000,
        "bits": 16, "n_frames": 25, "duration_ms": 1,
    }
    # LIST chunk with an ODD size before fmt: pos must advance by the
    # padded size or the fmt scan desyncs
    body = b"d" * 32
    odd = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    w = wav_decoder(odd)
    assert (w["channels"], w["sample_rate"], w["bits"]) == (1, 8000, 8)
    assert w["n_frames"] == 32 and w["duration_ms"] == 4
    # RIFF/WAVE but no fmt chunk: format known, fields None
    nofmt = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    assert wav_decoder(nofmt) == {
        "format": "audio/wav", "channels": None, "sample_rate": None,
        "bits": None, "n_frames": None, "duration_ms": None,
    }
    for junk in (b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00AVI ", b"ID3\x03"):
        assert wav_decoder(junk)["format"] == "application/octet-stream"


def test_audio_roundtrip_matches_formulas(spark):
    from dicomdb_spark.llm import multimodal as mm

    docs = load_table(spark, SF, "documents").limit(50)
    out = mm.decode_audio_meta(mm.containerize_audio(docs)).collect()
    assert len(out) == 50
    for r in out:
        assert r.format == "audio/wav"
        assert r.channels == r.doc_id % 2 + 1
        assert r.sample_rate == 8000 * (r.doc_id % 5 + 1)
        assert r.bits == 8 * (r.doc_id % 3 + 1)
        ba = (r.doc_id % 2 + 1) * (r.doc_id % 3 + 1)
        assert r.n_frames == (r.n_bytes - 44) // ba
        assert r.duration_ms == r.n_frames * 1000 // r.sample_rate


def test_eccentricity_matches_python_bfs(spark):
    """Replay full BFS per node in Python over the same minhash-pair
    edges; six relaxation rounds must have converged on the fixture
    (tiny dup clusters), so ecc/diameter equal the true values."""
    from collections import deque

    from dicomdb_spark.llm import dedup as ldedup
    from dicomdb_spark.registry.q01 import _docs_with_dupes

    pairs = ldedup.minhash_lsh_pairs(
        _docs_with_dupes(spark, SF), "doc_id", "text",
        num_hashes=16, bands=4,
    ).collect()
    adj = {}
    for r in pairs:
        adj.setdefault(r.id1, set()).add(r.id2)
        adj.setdefault(r.id2, set()).add(r.id1)
    rows = {r.doc_id: r for r in QUERIES["graph_eccentricity"](spark, SF).collect()}
    assert set(rows) == set(adj)
    diam = 0
    for s in adj:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        ecc = max(dist.values())
        diam = max(diam, ecc)
        r = rows[s]
        assert (r.n_reached, r.ecc) == (len(dist), ecc)
        assert r.converged == 1
    assert all(r.diameter == diam for r in rows.values())


def test_zigzag_bruteforce(spark):
    rows = {r.event_type: r for r in QUERIES["w_zigzag_pivots"](spark, SF).collect()}
    for t, b in _bars_py().items():
        ys = [p for _, _, p, _, _ in b]
        th = max((max(ys) - min(ys)) // 5, 1)
        d, ext, sw = 0, ys[0], 0
        for y in ys[1:]:
            if d == 0:
                if abs(y - ext) >= th:
                    d = 1 if y > ext else -1
                    ext = y
            elif d == 1:
                if y > ext:
                    ext = y
                elif ext - y >= th:
                    d, ext, sw = -1, y, sw + 1
            else:
                if y < ext:
                    ext = y
                elif y - ext >= th:
                    d, ext, sw = 1, y, sw + 1
        r = rows[t]
        assert (r.threshold_cents, r.final_dir, r.final_extreme, r.n_swings) == (
            th, d, ext, sw,
        )


def _lcs(a, b):
    m = len(b)
    prev = [0] * (m + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[m]


def test_lcs_and_fog_bruteforce(spark):
    import duckdb
    import re
    from collections import defaultdict

    docs = duckdb.connect().execute(
        f"SELECT source, doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    per = defaultdict(list)
    fog_in = defaultdict(lambda: [0, 0, 0])  # words, complex, sentences
    for s, i, t in docs:
        per[s].append((i, re.sub(r"[^ -~]", "", t)[:32]))
        toks = [x.lower() for x in t.strip().split()]
        fog_in[s][0] += len(toks)
        fog_in[s][1] += sum(
            1 for x in toks if len(re.findall(r"[aeiouy]+", x)) >= 3
        )
        fog_in[s][2] += max(len(re.findall(r"[.!?]+", t)), 1)
    rows = {r.source: r for r in QUERIES["text_lcs_length"](spark, SF).collect()}
    for s, lst in per.items():
        if len(lst) < 2 or not min(lst)[1] or not max(lst)[1]:
            continue
        a, b = min(lst)[1], max(lst)[1]
        r = rows[s]
        want = _lcs(a, b)
        assert r.lcs == want
        assert r.indel_dist == len(a) + len(b) - 2 * want
        assert r.indel_ge_lev == 1
        assert r.lcs_sim == 2.0 * want / (len(a) + len(b))
    fog = {r.source: r for r in QUERIES["text_gunning_fog"](spark, SF).collect()}
    for s, (w, c, sent) in fog_in.items():
        r = fog[s]
        assert (r.words, r.complex_words, r.sentences) == (w, c, sent)
        assert r.fog == 0.4 * (float(w) / float(sent) + 100.0 * float(c) / float(w))
    # fixed adversarial LCS vectors through the same replay
    assert _lcs("ABCBDAB", "BDCABA") == 4
    assert _lcs("", "xyz") == 0
    assert _lcs("aaaa", "aa") == 2


def test_hartley_and_by_bruteforce(spark):
    from fractions import Fraction

    var = {}
    for t, b in _bars_py().items():
        vs = [v for _, v, _, _, _ in b]
        n, s1, s2 = len(vs), sum(vs), sum(v * v for v in vs)
        var[t] = Fraction(n * s2 - s1 * s1, n * n)
    t_max = max(var, key=lambda t: (var[t], t))
    t_min = min(var, key=lambda t: (var[t], t))
    r = QUERIES["a_hartley_fmax"](spark, SF).collect()[0]
    assert (r.type_max, r.type_min) == (t_max, t_min)
    assert r.fmax == float(r.v_max * r.n_min * r.n_min) / float(
        r.v_min * r.n_max * r.n_max
    )
    assert r.fmax >= 1.0
    rows = QUERIES["a_benjamini_yekutieli"](spark, SF).collect()
    m = len(rows)
    c_m = 0.0
    for i in range(1, m + 1):
        c_m += 1.0 / i
    for r in rows:
        assert r.c_m == c_m
        assert r.by_subset_bh == 1
        if r.rejected_by:
            assert r.rejected_bh  # BY rejections are a subset of BH


def test_orc_roundtrip_lossless(spark):
    """The ORC write/read must reproduce the parquet-derived aggregate
    exactly (lossless columnar interchange)."""
    import duckdb

    want = {
        r[0]: (int(r[1]), int(r[2]), int(r[3]))
        for r in duckdb.connect().execute(
            "SELECT l_returnflag, count(*),"
            " SUM(CAST(floor(l_extendedprice*100) AS BIGINT)), SUM(l_orderkey)"
            f" FROM '{SF}/lineitem.parquet' GROUP BY 1"
        ).fetchall()
    }
    got = {
        r.l_returnflag: (r.n_rows, r.sum_cents, r.sum_keys)
        for r in QUERIES["s14_orc_roundtrip"](spark, SF).collect()
    }
    assert got == want


def test_ljung_box_bruteforce(spark):
    import duckdb
    import math

    ys = [
        int(r[0])
        for r in duckdb.connect().execute(
            "SELECT SUM(CAST(floor(value*100) AS BIGINT)) FROM "
            f"'{SF}/events.parquet' GROUP BY CAST(ts AS DATE) "
            "ORDER BY CAST(ts AS DATE)"
        ).fetchall()
    ]
    n, s = len(ys), sum(ys)
    dev = [n * y - s for y in ys]
    acv = [
        sum(
            math.floor(float(dev[i]) * float(dev[i + k]) / 1e8)
            for i in range(n - k)
        )
        for k in range(6)
    ]
    r = QUERIES["a_ljung_box"](spark, SF).collect()[0]
    assert r.n_days == n
    assert [r.a0, r.a1, r.a2, r.a3, r.a4, r.a5] == acv
    q = float(n) * (float(n) + 2.0) * (
        (acv[1] / acv[0]) * (acv[1] / acv[0]) / (float(n) - 1.0)
        + (acv[2] / acv[0]) * (acv[2] / acv[0]) / (float(n) - 2.0)
        + (acv[3] / acv[0]) * (acv[3] / acv[0]) / (float(n) - 3.0)
        + (acv[4] / acv[0]) * (acv[4] / acv[0]) / (float(n) - 4.0)
        + (acv[5] / acv[0]) * (acv[5] / acv[0]) / (float(n) - 5.0)
    )
    assert r.q_lb == q and r.q_lb >= 0.0


def test_kendall_w_and_cochran_c_bruteforce(spark):
    from fractions import Fraction

    bars = _bars_py()
    types = sorted(bars)
    n = len(types)
    per_day = {}
    for t, b in bars.items():
        for day, v, _, _, _ in b:
            per_day.setdefault(day, {})[t] = v
    blocks = {d: mm for d, mm in per_day.items() if len(mm) == n}
    m = len(blocks)
    r2_sum = dict.fromkeys(types, 0)
    t_total = 0
    for d, mm in blocks.items():
        vols = sorted(mm.values())
        from collections import Counter

        for t in types:
            v = mm[t]
            p = sum(1 for x in vols if x < v)
            ties = sum(1 for x in vols if x == v)
            r2_sum[t] += 2 * (p + 1) + ties - 1
        t_total += sum(c**3 - c for c in Counter(vols).values())
    s4 = sum((r2_sum[t] - m * (n + 1)) ** 2 for t in types)
    r = QUERIES["a_kendall_w"](spark, SF).collect()[0]
    assert (r.n_objects, r.n_blocks, r.s4, r.t_total) == (n, m, s4, t_total)
    assert r.w == 3.0 * float(s4) / float(m * m * (n**3 - n) - m * t_total)
    assert 0.0 <= r.w <= 1.0
    # Cochran's C from the same bars
    s2 = {}
    for t, b in bars.items():
        vs = [v for _, v, _, _, _ in b]
        ng, s1, ss = len(vs), sum(vs), sum(v * v for v in vs)
        s2[t] = float(ng * ss - s1 * s1) / (float(ng) * float(ng))
    acc = 0.0
    for t in sorted(s2):
        acc += s2[t]
    rc = QUERIES["a_cochran_c"](spark, SF).collect()[0]
    assert rc.k == len(s2)
    assert rc.s2_max == max(s2.values()) and rc.s2_sum == acc
    assert rc.c == max(s2.values()) / acc
    assert Fraction(1, len(s2)) <= Fraction(rc.c).limit_denominator(10**9)


def test_gwet_ac1_consistent_with_kappa_raters(spark):
    """AC1 must use the exact same rater pair as ml_cohens_kappa
    (identical n/agree/margins) and satisfy the binary AC1 identity."""
    k = QUERIES["ml_cohens_kappa"](spark, SF).collect()[0]
    g = QUERIES["a_gwet_ac1"](spark, SF).collect()[0]
    assert (g.n, g.agree, g.n_pos_a, g.n_pos_b) == (
        k.n, k.agree, k.n_pos_a, k.n_pos_b,
    )
    n, a1, b1 = g.n, g.n_pos_a, g.n_pos_b
    pe2n2 = (a1 + b1) * (2 * n - a1 - b1)
    assert g.ac1 == float(2 * n * g.agree - pe2n2) / float(2 * n * n - pe2n2)
    assert g.pi_hat == float(a1 + b1) / float(2 * n)


def test_cronbach_icc_bruteforce(spark):
    bars = _bars_py()
    types = sorted(bars)
    k = len(types)
    per_day = {}
    for t, b in bars.items():
        for day, v, _, _, _ in b:
            per_day.setdefault(day, {})[t] = v
    blocks = {d: mm for d, mm in per_day.items() if len(mm) == k}
    m = len(blocks)
    sum_vi = 0
    for t in types:
        vs = [blocks[d][t] for d in blocks]
        sum_vi += m * sum(v * v for v in vs) - sum(vs) ** 2
    ts = [sum(mm.values()) for mm in blocks.values()]
    v_t = m * sum(t * t for t in ts) - sum(ts) ** 2
    r = QUERIES["a_cronbach_alpha"](spark, SF).collect()[0]
    assert (r.k, r.n_blocks, r.sum_vi, r.v_t) == (k, m, sum_vi, v_t)
    assert r.alpha == (float(k) / (float(k) - 1.0)) * (
        float(v_t - sum_vi) / float(v_t)
    )
    # ICC(1) replay from the raw ANOVA decomposition (floats) must
    # agree with the integer-encoded query value to fp tolerance, and
    # the exported integer identity must hold exactly
    xs = [v for mm in blocks.values() for v in mm.values()]
    nn, g, c = len(xs), sum(xs), sum(v * v for v in xs)
    a = sum(t * t for t in ts)
    between = (nn - m) * (nn * a - k * g * g)
    within = (m - 1) * (k * nn * c - nn * a)
    ri = QUERIES["a_icc_oneway"](spark, SF).collect()[0]
    assert (ri.k, ri.n_blocks, ri.n_obs) == (k, m, nn)
    assert ri.icc1 == float(between - within) / float(
        between + (k - 1) * within
    )
    ssb = a / k - g * g / nn
    ssw = c - a / k
    msb, msw = ssb / (m - 1), ssw / (nn - m)
    assert abs(ri.icc1 - (msb - msw) / (msb + (k - 1) * msw)) < 1e-9


def test_stuart_maxwell_bruteforce(spark):
    import duckdb
    from collections import defaultdict

    rows = duckdb.connect().execute(
        "SELECT user_id, CASE WHEN dayofmonth(CAST(ts AS DATE)) <= 15"
        " THEN 0 ELSE 1 END, SUM(CAST(floor(value*100) AS BIGINT)),"
        f" count(*) FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per = defaultdict(dict)
    for uid, half, c, n in rows:
        per[uid][half] = int(c)
    pairs = [
        (per[u][0] % 3, per[u][1] % 3) for u in per if 0 in per[u] and 1 in per[u]
    ]
    n = len(pairs)
    r0 = sum(1 for c1, _ in pairs if c1 == 0)
    r1 = sum(1 for c1, _ in pairs if c1 == 1)
    k0 = sum(1 for _, c2 in pairs if c2 == 0)
    k1 = sum(1 for _, c2 in pairs if c2 == 1)
    n00 = sum(1 for c1, c2 in pairs if (c1, c2) == (0, 0))
    n11 = sum(1 for c1, c2 in pairs if (c1, c2) == (1, 1))
    n01 = sum(1 for c1, c2 in pairs if (c1, c2) == (0, 1))
    n10 = sum(1 for c1, c2 in pairs if (c1, c2) == (1, 0))
    d0, d1 = r0 - k0, r1 - k1
    v00, v11, v01 = r0 + k0 - 2 * n00, r1 + k1 - 2 * n11, -(n01 + n10)
    det = v00 * v11 - v01 * v01
    out = QUERIES["a_stuart_maxwell"](spark, SF).collect()
    if det <= 0:
        assert out == []
        return
    r = out[0]
    assert (r.n_pairs, r.d0, r.d1, r.v00, r.v11, r.v01) == (
        n, d0, d1, v00, v11, v01,
    )
    want = float(v11 * d0 * d0 - 2 * v01 * d0 * d1 + v00 * d1 * d1) / float(det)
    assert r.chi2_sm == want and r.chi2_sm >= 0.0


def test_chi2_keyness_bruteforce(spark):
    import duckdb
    from collections import Counter, defaultdict

    docs = duckdb.connect().execute(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for s, t in docs:
        per[s].append(t)
    top2 = sorted(per, key=lambda s: (-len(per[s]), s))[:2]
    ca, cb = Counter(), Counter()
    for t in per[top2[0]]:
        ca.update(x.lower() for x in t.strip().split())
    for t in per[top2[1]]:
        cb.update(x.lower() for x in t.strip().split())
    n1, n2 = sum(ca.values()), sum(cb.values())
    scores = {}
    for term in set(ca) | set(cb):
        a, b = ca[term], cb[term]
        c, d = n1 - a, n2 - b
        ad_bc = float(a) * float(d) - float(b) * float(c)
        scores[term] = (
            float(a + b + c + d) * ad_bc * ad_bc
            / (float(a + b) * float(c + d) * float(n1) * float(n2))
        )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["text_chi2_keyness"](spark, SF).collect()
    assert len(got) == 20
    for r, (term, chi2) in zip(got, want):
        assert (r.term, r.count_a, r.count_b) == (term, ca[term], cb[term])
        assert r.chi2 == chi2


def test_pettitt_bruteforce(spark):
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT CAST(ts AS DATE), SUM(CAST(floor(value*100) AS BIGINT)) FROM "
        f"'{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [d for d, _ in rows]
    ys = [int(y) for _, y in rows]
    n = len(ys)
    us = []
    for t in range(1, n):
        u = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(t)
            for j in range(t, n)
        )
        us.append(u)
    k = max(abs(u) for u in us)
    idx = next(i for i, u in enumerate(us) if abs(u) == k)
    r = QUERIES["w_pettitt_test"](spark, SF).collect()[0]
    assert (r.n_days, r.k_stat) == (n, k)
    assert r.change_day == days[idx] and r.u_at_k == us[idx]


def test_average_precision_bruteforce(spark):
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT label % 2, "
        "CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]), "
        "v -> CAST(floor(v * v * 1000000) AS BIGINT))) AS BIGINT), "
        f"vec_id FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    ranked = sorted(rows, key=lambda r: (-r[1], r[2]))
    tp, sum_terms, n_pos = 0, 0, sum(int(y) for y, _, _ in ranked)
    for k, (y, _, _) in enumerate(ranked, 1):
        tp += int(y)
        if y == 1:
            sum_terms += (1000000 * tp) // k
    r = QUERIES["ml_average_precision"](spark, SF).collect()[0]
    assert (r.n, r.n_pos, r.sum_terms) == (len(ranked), n_pos, sum_terms)
    assert r.avg_precision == float(sum_terms) / (1000000.0 * float(n_pos))
    assert 0.0 < r.avg_precision <= 1.0


def test_partial_corr_bruteforce(spark):
    import duckdb
    import math

    rows = duckdb.connect().execute(
        "SELECT CAST(ts AS DATE) AS day, count(*),"
        " SUM(CAST(floor(value*100) AS BIGINT)) FROM "
        f"'{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    xs = [int(r[1]) for r in rows]
    ys = [int(r[2]) for r in rows]
    # Sunday-based dow (Spark's convention, any constant shift of it —
    # Pearson r is shift-invariant, but a WRAPPED rotation like ISO
    # weekday is NOT a shift and would change the correlation)
    zs = [(r[0].weekday() + 1) % 7 for r in rows]
    n = len(xs)

    def r_of(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        return float(n * sab - sa * sb) / (
            math.sqrt(float(n * saa - sa * sa)) * math.sqrt(float(n * sbb - sb * sb))
        )

    rxy, rxz, ryz = r_of(xs, ys), r_of(xs, zs), r_of(ys, zs)
    r = QUERIES["a_partial_corr"](spark, SF).collect()[0]
    assert r.n_days == n
    assert abs(r.rxy - rxy) < 1e-12 and abs(r.rxz - rxz) < 1e-12
    want = (rxy - rxz * ryz) / (
        math.sqrt(1.0 - rxz * rxz) * math.sqrt(1.0 - ryz * ryz)
    )
    assert abs(r.r_xy_given_z - want) < 1e-12
    assert -1.0 <= r.r_xy_given_z <= 1.0


def test_quade_bruteforce(spark):
    bars = _bars_py()
    types = sorted(bars)
    k = len(types)
    per_day = {}
    for t, b in bars.items():
        for day, v, _, _, _ in b:
            per_day.setdefault(day, {})[t] = v
    blocks = {d: mm for d, mm in per_day.items() if len(mm) == k}
    b_n = len(blocks)
    spreads = {d: max(mm.values()) - min(mm.values()) for d, mm in blocks.items()}
    svals = list(spreads.values())
    s4 = {}
    for d, mm in blocks.items():
        sp = spreads[d]
        q2 = (
            2 * sum(1 for x in svals if x < sp)
            + sum(1 for x in svals if x == sp) - 1 + 2
        )
        vols = sorted(mm.values())
        for t in types:
            v = mm[t]
            p = sum(1 for x in vols if x < v)
            ties = sum(1 for x in vols if x == v)
            r2 = 2 * (p + 1) + ties - 1
            s4[(d, t)] = q2 * (r2 - (k + 1))
    a16 = sum(v * v for v in s4.values())
    sj = {t: sum(v for (d, tt), v in s4.items() if tt == t) for t in types}
    sum_sj_sq = sum(v * v for v in sj.values())
    r = QUERIES["a_quade_test"](spark, SF).collect()[0]
    assert (r.n_blocks, r.k, r.a16, r.sum_sj4_sq) == (b_n, k, a16, sum_sj_sq)
    assert r.quade_f == float((b_n - 1) * sum_sj_sq) / float(b_n * a16 - sum_sj_sq)


def test_gmd_robust_location_mase_bruteforce(spark):
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT CAST(ts AS DATE), SUM(CAST(floor(value*100) AS BIGINT)) FROM "
        f"'{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    ys = [int(y) for _, y in rows]
    n = len(ys)
    sum_abs = sum(abs(a - b) for i, a in enumerate(ys) for b in ys[i + 1:])
    g = QUERIES["a_gini_mean_difference"](spark, SF).collect()[0]
    assert (g.n_days, g.sum_abs, g.sum_y) == (n, sum_abs, sum(ys))
    assert g.gmd == 2.0 * float(sum_abs) / (float(n) * (float(n) - 1.0)) / 100.0
    assert g.gini_coeff == float(sum_abs) / ((float(n) - 1.0) * float(sum(ys)))
    sy = sorted(ys)
    q1 = sy[(n + 3) // 4 - 1]
    q2 = sy[(n + 1) // 2 - 1]
    q3 = sy[(3 * n + 1) // 4 - 1]
    r = QUERIES["a_robust_location"](spark, SF).collect()[0]
    assert (r.q1_cents, r.q2_cents, r.q3_cents) == (q1, q2, q3)
    assert r.midrange == (sy[0] + sy[-1]) / 2.0 / 100.0
    assert r.midhinge == (q1 + q3) / 2.0 / 100.0
    assert r.trimean == (q1 + 2 * q2 + q3) / 4.0 / 100.0
    # MASE/tracking signal per type
    mase = {x.event_type: x for x in QUERIES["a_forecast_mase"](spark, SF).collect()}
    for t, b in _bars_py().items():
        ps = [p for _, _, p, _, _ in b]
        scored = [
            (ps[i] - ps[i - 1], ps[i] - ps[i - 7])
            for i in range(7, len(ps))
        ]
        if not scored:
            continue
        m1 = sum(abs(e1) for e1, _ in scored)
        m7 = sum(abs(e7) for _, e7 in scored)
        es = sum(e1 for e1, _ in scored)
        if m1 > 0 and m7 > 0:
            x = mase[t]
            assert (x.n_scored, x.mae1_sum, x.mae7_sum, x.err_sum) == (
                len(scored), m1, m7, es,
            )
            assert x.mase == float(m1) / float(m7)
            assert x.tracking_signal == float(len(scored) * es) / float(m1)


def test_bartels_and_hl_shift_bruteforce(spark):
    import duckdb
    import math

    rows = duckdb.connect().execute(
        "SELECT CAST(ts AS DATE), SUM(CAST(floor(value*100) AS BIGINT)) FROM "
        f"'{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    days = [d for d, _ in rows]
    ys = [int(y) for _, y in rows]
    n = len(ys)
    r2 = [
        2 * sum(1 for x in ys if x < y) + sum(1 for x in ys if x == y) - 1 + 2
        for y in ys
    ]
    nm4 = sum((a - b) ** 2 for a, b in zip(r2, r2[1:]))
    dn4 = sum((x - (n + 1)) ** 2 for x in r2)
    r = QUERIES["a_bartels_rank_test"](spark, SF).collect()[0]
    assert (r.n_days, r.nm4, r.dn4) == (n, nm4, dn4)
    assert r.rvn == float(nm4) / float(dn4)
    assert r.z == (float(nm4) / float(dn4) - 2.0) / math.sqrt(4.0 / float(n))
    # HL shift: median of pairwise after - before
    before = [y for d, y in zip(days, ys) if d.day <= 15]
    after = [y for d, y in zip(days, ys) if d.day > 15]
    diffs = sorted(b - a for a in before for b in after)
    np_ = len(diffs)
    lo = diffs[(np_ + 1) // 2 - 1]
    hi = diffs[np_ // 2]
    h = QUERIES["a_hl_shift"](spark, SF).collect()[0]
    assert (h.n_pairs, h.hl_lo_cents, h.hl_hi_cents) == (np_, lo, hi)
    assert h.hl_shift == (lo + hi) / 2.0 / 100.0


def test_degree_gini_and_diagnostic_ratios_bruteforce(spark):
    from collections import Counter

    from dicomdb_spark.llm import dedup as ldedup
    from dicomdb_spark.registry.q01 import _docs_with_dupes

    pairs = ldedup.minhash_lsh_pairs(
        _docs_with_dupes(spark, SF), "doc_id", "text",
        num_hashes=16, bands=4,
    ).collect()
    deg = Counter()
    for r in pairs:
        deg[r.id1] += 1
        deg[r.id2] += 1
    ds = list(deg.values())
    n, s = len(ds), sum(ds)
    sum_abs = sum(
        abs(a - b) for i, a in enumerate(ds) for b in ds[i + 1:]
    )
    g = QUERIES["graph_degree_gini"](spark, SF).collect()[0]
    assert (g.n_nodes, g.sum_deg, g.sum_abs) == (n, s, sum_abs)
    assert g.degree_gini == float(sum_abs) / ((float(n) - 1.0) * float(s))
    assert 0.0 <= g.degree_gini < 1.0
    # diagnostic panel must share the confusion matrix with the
    # precision/recall query and satisfy the closed identities
    c = QUERIES["ml_confusion_metrics"](spark, SF).collect()[0]
    d = QUERIES["ml_diagnostic_ratios"](spark, SF).collect()[0]
    assert (d.tp, d.fp, d.fn, d.tn) == (c.tp, c.fp, c.fn, c.tn)
    sens = float(d.tp) / float(d.tp + d.fn)
    spec = float(d.tn) / float(d.tn + d.fp)
    assert d.sensitivity == sens and d.specificity == spec
    assert d.youden_j == sens + spec - 1.0
    assert d.balanced_accuracy == (sens + spec) / 2.0
    assert d.diagnostic_odds_ratio == float(d.tp * d.tn) / float(d.fp * d.fn)
