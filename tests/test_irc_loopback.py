"""Loopback-socket integration test for the live IRC source (S1).

The framing/offset logic of ``_IRCStreamReader`` is unit-tested in
``test_io_sources.py``; THIS file executes the paths that only a real
socket exercises — ``_connect`` (auth handshake on the wire), ``_poll``
(select/recv framing of data a real server wrote), PING→PONG keepalive,
and reconnect-after-drop (the reference receiver's retry exists exactly
because this path breaks: ``IRCBot.scala:38``). No external network: a
minimal in-process IRC server on 127.0.0.1.
"""

from __future__ import annotations

import re
import socket
import threading
import time

import pytest

from spark_streaming_twitch_analytics_spark.sources import irc

pytestmark = pytest.mark.skipif(
    not irc.HAS_DATASOURCE_API, reason="Spark 4 Python DataSource API absent"
)


class MiniIRCServer(threading.Thread):
    """Scripted two-session IRC server: session 1 handshakes, emits
    messages, PINGs (recording the PONG), then DROPS the connection;
    session 2 accepts the reconnect, handshakes again, emits more."""

    def __init__(self):
        super().__init__(daemon=True)
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(2)
        self.port = self.srv.getsockname()[1]
        self.handshakes: list[list[str]] = []  # lines received before JOIN
        self.pong_line: str | None = None
        self.got_pong = threading.Event()
        self.stop_evt = threading.Event()
        self.errors: list[str] = []

    def _read_until(self, conn, predicate, deadline=15.0) -> list[str]:
        conn.settimeout(1.0)
        buf, lines = b"", []
        t0 = time.time()
        while time.time() - t0 < deadline:
            try:
                data = conn.recv(4096)
            except socket.timeout:
                continue
            if not data:
                break
            buf += data
            *done, buf = buf.split(b"\r\n")
            for raw in done:
                line = raw.decode()
                lines.append(line)
                if predicate(line):
                    return lines
        return lines

    def _send(self, conn, line: str) -> None:
        conn.sendall((line + "\r\n").encode())

    def run(self) -> None:
        try:
            # --- session 1: handshake, chat, PING, drop -----------------
            conn, _ = self.srv.accept()
            hs = self._read_until(conn, lambda l: l.startswith("JOIN "))
            self.handshakes.append(hs)
            self._send(conn, ":tmi.twitch.tv 001 botnick :Welcome, GLHF!")
            for i in range(3):
                self._send(
                    conn,
                    f":alice!alice@alice.tmi.twitch.tv PRIVMSG #chan :hello one {i}",
                )
            self._send(conn, "PING :tmi.twitch.tv")
            pong = self._read_until(conn, lambda l: l.startswith("PONG"))
            self.pong_line = next(
                (l for l in pong if l.startswith("PONG")), None
            )
            if self.pong_line:
                self.got_pong.set()
            conn.close()  # hard drop → client must reconnect
            # --- session 2: the reconnect ------------------------------
            conn2, _ = self.srv.accept()
            hs2 = self._read_until(conn2, lambda l: l.startswith("JOIN "))
            self.handshakes.append(hs2)
            for i in range(2):
                self._send(
                    conn2,
                    f":bob!bob@bob.tmi.twitch.tv PRIVMSG #chan :after reconnect {i}",
                )
            self.stop_evt.wait(20)
            conn2.close()
        except Exception as e:  # surfaces in the main thread's asserts
            self.errors.append(f"{type(e).__name__}: {e}")
        finally:
            self.srv.close()

    def shutdown(self) -> None:
        self.stop_evt.set()


def _drain(reader, start, want, deadline=15.0):
    """Poll the reader until `want` rows arrived (or deadline)."""
    rows = []
    t0 = time.time()
    while time.time() - t0 < deadline and len(rows) < want:
        it, end = reader.read(start)
        rows.extend(v for (v,) in it)
        start = end
        time.sleep(0.05)
    return rows, start


def test_reader_connect_pong_reconnect_against_loopback_server():
    server = MiniIRCServer()
    server.start()
    reader = irc._IRCStreamReader(
        {
            "host": "127.0.0.1",
            "port": str(server.port),
            "channel": "chan",
            "nick": "botnick",
            "token": "oauth:sekrit",
        }
    )
    try:
        # session 1: the three PRIVMSGs arrive through _connect + _poll
        rows, start = _drain(reader, {"n": 0}, want=3)
        assert len(rows) == 3, (rows, server.errors)
        # stored shape: epoch-millis prefix + server line w/o leading ':'
        assert all(
            re.match(r"^\d{13}:alice!alice@.* PRIVMSG #chan :hello one \d$", v)
            for v in rows
        ), rows
        # handshake hit the wire in order: PASS, NICK, JOIN
        hs = server.handshakes[0]
        assert "PASS oauth:sekrit" in hs and "NICK botnick" in hs
        assert "JOIN #chan" in hs
        # PING was answered with the server's token (IRCBot.scala:47-49).
        # The reader only services PINGs inside _poll (i.e. during read),
        # so keep polling while we wait — a bare Event.wait could hang if
        # the PING landed in a TCP segment after the read that delivered
        # the third PRIVMSG (ADVICE r6). Reads are retained/idempotent.
        extra = []  # rows delivered while polling (kept — could be session 2)
        t0 = time.time()
        while not server.got_pong.is_set() and time.time() - t0 < 10:
            it, start = reader.read(start)
            extra.extend(v for (v,) in it)
            time.sleep(0.05)
        assert server.got_pong.is_set(), server.errors
        assert server.pong_line == "PONG :tmi.twitch.tv"
        # commit prunes the retained log up to the committed offset
        reader.commit(start)
        assert not reader.log

        # the server dropped the connection: the next polls must
        # reconnect (re-handshake) and deliver session-2 messages (any
        # already captured by the PONG-wait polls count toward the two)
        rows2, start = _drain(reader, start, want=2 - len(extra))
        rows2 = extra + rows2
        assert len(rows2) == 2, (rows2, server.errors)
        assert all("after reconnect" in v for v in rows2), rows2
        assert len(server.handshakes) == 2  # reconnect re-sent NICK/JOIN
        assert "NICK botnick" in server.handshakes[1]
        assert not server.errors, server.errors
    finally:
        server.shutdown()
        reader.stop()
        server.join(timeout=20)


def test_streaming_query_reads_loopback_irc_source(spark, tmp_path):
    """End-to-end: the registered ``irc_chat`` DataSource serving a real
    micro-batch query from the loopback server (no drop — reconnect is
    covered reader-level above; this pins the Spark plumbing: register →
    readStream → offsets → memory sink)."""
    server = MiniIRCServer()
    server.start()
    spark.dataSource.register(irc.IRCSocketDataSource)
    q = None
    try:
        stream = (
            spark.readStream.format("irc_chat")
            .option("host", "127.0.0.1")
            .option("port", str(server.port))
            .option("channel", "chan")
            .option("nick", "botnick")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("irc_loopback")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline and n < 3:
            n = spark.sql("SELECT count(*) c FROM irc_loopback").first()["c"]
            time.sleep(0.25)
        assert n >= 3, (n, server.errors)
        vals = [r["value"] for r in spark.sql("SELECT * FROM irc_loopback").collect()]
        assert all("PRIVMSG #chan" in v and re.match(r"^\d{13}:", v) for v in vals)
    finally:
        server.shutdown()
        if q is not None:
            q.stop()
        server.join(timeout=20)
