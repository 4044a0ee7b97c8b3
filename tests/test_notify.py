"""SMTP/file notification sink (sources/notify.py — the reference's
common.py:440-468 side-channel)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dicomdb_spark.sources import notify


class _RecordingSMTP:
    """smtplib.SMTP surface recorder (injected client seam)."""

    instances: list["_RecordingSMTP"] = []

    def __init__(self, host, port):
        self.host, self.port = host, port
        self.calls: list[tuple] = []
        _RecordingSMTP.instances.append(self)

    def starttls(self):
        self.calls.append(("starttls",))

    def login(self, user, pwd):
        self.calls.append(("login", user, pwd))

    def sendmail(self, sender, tos, msg):
        self.calls.append(("sendmail", sender, tuple(tos), msg))

    def quit(self):
        self.calls.append(("quit",))


def test_render_notification_matches_reference_shape(spark):
    df = spark.createDataFrame(
        [Row(exam="E1", suj="S1", ser="Ser3", path="/data/E1/S1/Ser3")]
    )
    out = df.select(
        *notify.render_notification(["exam", "suj", "ser", "path"])
    ).first()
    assert out.subject == "Dicom files problem"
    # header line + the reference's "Please check \t exa \t suj \t ser"
    assert out.body == (
        "Missing or corrupt dicom files \n"
        "\n Please check \tE1 \tS1 \tSer3 \t/data/E1/S1/Ser3"
    )


def test_smtp_writer_partition_protocol():
    _RecordingSMTP.instances.clear()
    writer = notify.smtp_partition_writer(
        "mail.example.org",
        587,
        sender="engine@example.org",
        to="ops@example.org",
        username="u1",
        password="pw",
        client_factory=_RecordingSMTP,
    )
    rows = [
        Row(subject="Dicom files problem", body="b1"),
        Row(subject="Dicom files problem", body="b2"),
    ]
    writer(iter(rows))
    # ONE connection for the whole partition
    assert len(_RecordingSMTP.instances) == 1
    c = _RecordingSMTP.instances[0]
    kinds = [k[0] for k in c.calls]
    # starttls + login once, BEFORE any send; quit last
    assert kinds == ["starttls", "login", "sendmail", "sendmail", "quit"]
    assert c.calls[1] == ("login", "u1", "pw")
    sender, tos, msg = c.calls[2][1:]
    assert sender == "engine@example.org" and tos == ("ops@example.org",)
    assert "Subject: Dicom files problem" in msg and msg.endswith("b1")


def test_smtp_writer_empty_partition_opens_no_connection():
    _RecordingSMTP.instances.clear()
    writer = notify.smtp_partition_writer(
        "mail.example.org", 587, sender="a@x", to="b@x",
        client_factory=_RecordingSMTP,
    )
    writer(iter([]))
    assert _RecordingSMTP.instances == []


def test_smtp_writer_quits_on_failure():
    class _Failing(_RecordingSMTP):
        def sendmail(self, sender, tos, msg):
            raise ConnectionError("boom")

    _RecordingSMTP.instances.clear()
    writer = notify.smtp_partition_writer(
        "h", 25, sender="a@x", to="b@x", starttls=False,
        client_factory=_Failing,
    )
    with pytest.raises(ConnectionError):
        writer(iter([Row(subject="s", body="b")]))
    # connection released even on failure (quit in finally)
    assert ("quit",) in _RecordingSMTP.instances[0].calls


def _fname(key: str) -> str:
    """Expected sink name: sanitized stem + 8-hex md5 of the RAW key
    (collision-proof, still per-key idempotent)."""
    import hashlib

    safe = "".join(
        c if c.isalnum() or c in "_.-" else "_" for c in key
    ).lstrip(".") or "_"
    return f"{safe}.{hashlib.md5(key.encode()).hexdigest()[:8]}.txt"


def test_file_writer_idempotent_redelivery(tmp_path):
    writer = notify.file_partition_writer(str(tmp_path), name_col="key")
    rows = [Row(key="E1_S1_Ser3", subject="s", body="first")]
    writer(iter(rows))
    writer(iter([Row(key="E1_S1_Ser3", subject="s", body="second")]))
    files = sorted(p.name for p in tmp_path.iterdir())
    # redelivery overwrote — no timestamped duplicates (unlike
    # common.py:441's time.time() names)
    assert files == [_fname("E1_S1_Ser3")]
    assert (tmp_path / _fname("E1_S1_Ser3")).read_text() == "s\nsecond\n"


def test_file_writer_distinct_keys_never_collide(tmp_path):
    """Round-7 ADVICE fix: 'a/b' and 'a_b' sanitize to the same stem;
    the raw-key hash suffix must keep their files distinct."""
    writer = notify.file_partition_writer(str(tmp_path), name_col="key")
    writer(iter([
        Row(key="a/b", subject="s", body="slash"),
        Row(key="a_b", subject="s", body="underscore"),
    ]))
    files = sorted(p.name for p in tmp_path.iterdir())
    assert len(files) == 2
    assert (tmp_path / _fname("a/b")).read_text() == "s\nslash\n"
    assert (tmp_path / _fname("a_b")).read_text() == "s\nunderscore\n"


def test_notify_end_to_end_from_executors(spark, tmp_path):
    """Render + ship through foreachPartition on a real audit-shaped
    DataFrame — files land from executor tasks, nothing collects."""
    audit = spark.createDataFrame(
        [
            Row(exam="E1", suj="S1", ser="a", key="E1_S1_a"),
            Row(exam="E2", suj="S2", ser="b", key="E2_S2_b"),
        ]
    ).repartition(2)
    notify.notify_corrupt_series(
        audit,
        ["exam", "suj", "ser"],
        notify.file_partition_writer(str(tmp_path), name_col="key"),
    )
    assert sorted(p.name for p in tmp_path.iterdir()) == sorted(
        [_fname("E1_S1_a"), _fname("E2_S2_b")]
    )
    body = (tmp_path / _fname("E1_S1_a")).read_text()
    assert "Please check \tE1 \tS1 \ta" in body


def test_format_mime_is_deterministic():
    m1 = notify.format_mime("sub", "body", "a@x", "b@x")
    assert m1 == notify.format_mime("sub", "body", "a@x", "b@x")
    assert "Subject: sub" in m1 and m1.endswith("body")


def test_file_writer_sanitizes_traversal_names(tmp_path):
    """Keys derive from DICOM exam/series IDs (external data): a key
    containing '/' or '..' must not write outside out_dir — same
    whitelist as the tar sink (tar_sink.py:101)."""
    out = tmp_path / "drop"
    writer = notify.file_partition_writer(str(out), name_col="key")
    writer(iter([
        Row(key="../escape", subject="s", body="b"),
        Row(key="a/b/c", subject="s", body="b"),
        Row(key="..", subject="s", body="b"),
    ]))
    # nothing escaped out_dir
    assert sorted(p.name for p in tmp_path.iterdir()) == ["drop"]
    names = sorted(p.name for p in out.iterdir())
    assert names == sorted([_fname(".."), _fname("../escape"), _fname("a/b/c")])
    assert all(n.endswith(".txt") and "/" not in n for n in names)
