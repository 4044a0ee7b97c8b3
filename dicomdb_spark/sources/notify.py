"""SMTP / file notification sink (the reference's side-channel for
audit alerts).

Reference: ``common.py:450-468`` — ``send_mail`` formats a corrupt-
series report into a MIMEText message (fixed from/to, caller subject)
and ships it over STARTTLS SMTP; ``send_mail_file`` (common.py:440-448)
is the file-drop twin used when no SMTP credentials are configured.
Call sites (Exam_info.py:1355-1378, 793-800) build the body from the
audit tuple (exam, subject-id, series, corruption description, path).

Spark shape, same split as the S8 REST sink (sources/rest.py):

* **pure half** — :func:`render_notification` formats audit-result ROWS
  into (subject, body) message columns, JVM-side, fully checkable;
* **shipping half** — :func:`smtp_partition_writer` is a
  ``foreachPartition`` callable with one SMTP connection per PARTITION
  (never per row), STARTTLS + login matching the reference; the client
  is injectable so tests drive the full partition protocol without a
  mail server, and failures raise so Spark retries the task.
* :func:`file_partition_writer` — the ``send_mail_file`` twin; unlike
  the reference's ``time.time()`` filenames (re-runs duplicate), names
  derive from a row key column so redelivery overwrites idempotently.

At scale the notification set is an audit RESULT (corrupt series,
missing files) — orders of magnitude smaller than the data; the sink
still ships it from the executors (foreachPartition) rather than
collecting to the driver, so a pathological audit (every series
corrupt) cannot OOM the driver.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F


def render_notification(
    body_cols: Sequence[str],
    subject: str = "Dicom files problem",
    header: str = "Missing or corrupt dicom files",
) -> list[Column]:
    """Pure half: (subject, body) columns from an audit-result row.

    Mirrors the reference's message shape (Exam_info.py:1366-1367):
    a header line, then the identifying tuple tab-separated on a
    ``Please check`` line — one message per audit row.
    """
    body = F.concat(
        F.lit(header + " \n"),
        F.lit("\n Please check"),
        *[F.concat(F.lit(" \t"), F.col(c).cast("string")) for c in body_cols],
    )
    return [F.lit(subject).alias("subject"), body.alias("body")]


def format_mime(subject: str, body: str, sender: str, to: str) -> str:
    """Deterministic RFC-2822 text of one notification (the
    ``MIMEText`` + headers rendering of common.py:454-461), kept
    dependency-free so the pure half stays testable byte-for-byte."""
    return (
        'Content-Type: text/plain; charset="us-ascii"\n'
        "MIME-Version: 1.0\n"
        "Content-Transfer-Encoding: 7bit\n"
        f"Subject: {subject}\n"
        f"From: {sender}\n"
        f"To: {to}\n"
        "\n"
        f"{body}"
    )


def smtp_partition_writer(
    host: str,
    port: int,
    sender: str,
    to: str,
    username: str | None = None,
    password: str | None = None,
    starttls: bool = True,
    client_factory=None,
    subject_col: str = "subject",
    body_col: str = "body",
):
    """foreachPartition callable sending one mail per row.

    One connection per partition; STARTTLS + login before the first
    send (common.py:463-466).  ``client_factory(host, port)`` must
    return an object with the smtplib surface used here
    (``starttls/login/sendmail/quit``) — defaults to ``smtplib.SMTP``;
    tests inject a recorder.  Exceptions propagate so Spark retries
    the task: at-least-once, the same delivery contract as the
    reference's try/except-log (which silently DROPPED on failure —
    here the failure is visible and retried).
    """

    def write(rows: Iterator[Row]) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # empty partition: never open a connection
        if client_factory is not None:
            s = client_factory(host, port)
        else:  # pragma: no cover - needs a live SMTP server
            import smtplib

            s = smtplib.SMTP(host, port)
        try:
            if starttls:
                s.starttls()
            if username is not None:
                s.login(username, password)
            # chain keeps the partition lazily iterated — a starred
            # unpack would materialize the whole audit partition
            for row in itertools.chain([first], it):
                msg = format_mime(row[subject_col], row[body_col], sender, to)
                s.sendmail(sender, [to], msg)
        finally:
            s.quit()

    return write


def file_partition_writer(
    out_dir: str,
    name_col: str,
    subject_col: str = "subject",
    body_col: str = "body",
):
    """``send_mail_file`` twin: one ``<name>.txt`` per row under
    ``out_dir``.  The reference timestamped names (common.py:441-443),
    so every re-run duplicated the drop; deriving the name from a key
    column makes redelivery overwrite the same file (idempotent, the
    NIfTI-sink discipline).  Keys derive from DICOM exam/series IDs —
    external data — so the name is whitelist-sanitized (the tar-sink
    discipline, tar_sink.py:101): a key containing ``/`` or ``..``
    must not escape ``out_dir``.  Sanitization maps distinct keys like
    ``a/b`` and ``a_b`` to the same stem, so an 8-hex md5 of the RAW
    key is appended — per-key idempotent overwrite survives, cross-key
    collisions can't."""
    import hashlib

    def write(rows: Iterator[Row]) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            raw = str(row[name_col])
            safe = "".join(
                c if c.isalnum() or c in "_.-" else "_" for c in raw
            ).lstrip(".") or "_"
            tag = hashlib.md5(raw.encode("utf-8")).hexdigest()[:8]
            path = os.path.join(out_dir, f"{safe}.{tag}.txt")
            with open(path, "w") as fh:
                fh.write(f"{row[subject_col]}\n{row[body_col]}\n")

    return write


def notify_corrupt_series(
    audit: DataFrame,
    body_cols: Sequence[str],
    writer,
    subject: str = "Dicom files problem",
) -> None:
    """End-to-end: render + ship.  ``audit`` is the result of a
    completeness/corruption audit (A9/W4 family); ``writer`` is one of
    the partition writers above."""
    msgs = audit.select(
        *audit.columns, *render_notification(body_cols, subject=subject)
    )
    msgs.foreachPartition(writer)
