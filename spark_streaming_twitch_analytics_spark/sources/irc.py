"""IRC-shaped streaming sources (reference S1: custom TCP receiver,
``IRCBot.scala:11-68``).

Structured Streaming has no Receiver API; the rebuild offers three ways
to get the receiver's ``value: string`` stream (epoch-millis prefix +
raw IRC line, ``IRCBot.scala:52-53``):

1. :func:`file_line_source` — a directory of text files; each new file
   is a micro-batch. This is the deterministic test/replay path and the
   shape used by the streaming tests (FIXTURES §A7).
2. :func:`rate_source_lines` — maps Spark's ``rate`` source to synthetic
   IRC lines (load/perf testing without a network).
3. :class:`IRCSocketDataSource` — a Spark 4 Python DataSource that
   speaks enough IRC (PASS/NICK/JOIN, PING→PONG, PRIVMSG) over a TCP
   socket for live use. Network-dependent; gated so the module imports
   cleanly without it being exercised.

A batch of raw lines also arrives via :func:`write_batch_file` so tests
can script micro-batches one file at a time.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RAW_SCHEMA = "value string"


def format_privmsg(epoch_ms: int, user: str, channel: str, text: str) -> str:
    """The receiver's stored wire format (``IRCBot.scala:52-53``)."""
    return (
        f"{epoch_ms}:{user}!{user}@{user}.tmi.twitch.tv "
        f"PRIVMSG #{channel} :{text}"
    )


def write_batch_file(dir_path: str, lines: list[str], batch_id: int) -> str:
    """Write one micro-batch of raw lines as a new file (atomic rename so
    the file-stream source never sees partial content)."""
    os.makedirs(dir_path, exist_ok=True)
    tmp = os.path.join(dir_path, f".batch_{batch_id:06d}.tmp")
    dst = os.path.join(dir_path, f"batch_{batch_id:06d}.txt")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, dst)
    return dst


def file_line_source(spark: SparkSession, dir_path: str) -> DataFrame:
    """Unbounded ``value: string`` stream from a directory of text files."""
    os.makedirs(dir_path, exist_ok=True)
    return spark.readStream.format("text").load(dir_path)


_RATE_WORDS = [
    "stream", "spark", "hello", "pogchamp", "clip", "hype", "raid",
    "emote", "chat", "mods", "subs", "lurk", "play",
]


def rate_source_lines(
    spark: SparkSession, rows_per_second: int = 100, channel: str = "chan"
) -> DataFrame:
    """``rate`` source → synthetic IRC lines (deterministic given the
    rate source's value counter). Message text mixes countable chat
    words (>3 chars, Zipf-ish via the two modular picks) with short
    filler the word filter drops — so the downstream word counts are
    non-trivial, as on a real channel."""
    user = F.concat(F.lit("u"), (F.col("value") % 7).cast("string"))
    words = F.array(*[F.lit(w) for w in _RATE_WORDS])
    w1 = F.element_at(words, (F.col("value") % len(_RATE_WORDS) + 1).cast("int"))
    w2 = F.element_at(words, (F.col("value") % 5 + 1).cast("int"))
    line = F.concat(
        (F.unix_millis(F.col("timestamp"))).cast("string"),
        F.lit(":"),
        user,
        F.lit("!"),
        user,
        F.lit("@tmi PRIVMSG #"),
        F.lit(channel),
        F.lit(" :"),
        w1,
        F.lit(" "),
        w2,
        F.lit(" msg "),
        (F.col("value") % 31).cast("string"),
    )
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(line.alias("value"))
    )


# ---------------------------------------------------------------------------
# Live socket source (Spark 4 Python DataSource) — network path, optional
# ---------------------------------------------------------------------------

try:  # pragma: no cover - network/live path, exercised only manually
    from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

    class _IRCPartition(InputPartition):
        def __init__(self, lines: list[str]):
            self.lines = lines

    class IRCSocketDataSource(DataSource):
        """Minimal live IRC source: one reader connection, offsets are
        line counts. Options: host, port, channel, nick, token.

        Mirrors the reference receiver's behavior — auth handshake,
        PING→PONG keepalive, PRIVMSG lines stored with an epoch-millis
        prefix, reconnect on socket errors (``IRCBot.scala:30-55``)."""

        @classmethod
        def name(cls) -> str:
            return "irc_chat"

        def schema(self) -> str:
            return RAW_SCHEMA

        def streamReader(self, schema):
            return _IRCStreamReader(self.options)

    class _IRCStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            import socket

            self.opts = options
            self.buffer: list[str] = []
            self.offset = 0
            host = options.get("host", "irc.chat.twitch.tv")
            port = int(options.get("port", "6667"))
            self.sock = socket.create_connection((host, port), timeout=30)
            self.fh = self.sock.makefile("rw", encoding="utf-8", newline="\r\n")
            token = options.get("token", "")
            nick = options.get("nick", "justinfan12345")
            chan = options.get("channel", "")
            if token:
                self._send(f"PASS {token}")
            self._send(f"NICK {nick}")
            self._send(f"JOIN #{chan}")

        def _send(self, line: str) -> None:
            self.fh.write(line + "\r\n")
            self.fh.flush()

        def _poll(self) -> None:
            import select

            while select.select([self.sock], [], [], 0.0)[0]:
                line = self.fh.readline()
                if not line:
                    break
                line = line.rstrip("\r\n")
                if line.startswith("PING"):
                    self._send("PONG" + line[4:])
                elif "PRIVMSG" in line:
                    self.buffer.append(f"{int(time.time() * 1000)}:{line}")

        def initialOffset(self):
            return {"n": 0}

        def latestOffset(self):
            self._poll()
            return {"n": self.offset + len(self.buffer)}

        def partitions(self, start, end):
            take = end["n"] - start["n"]
            lines, self.buffer = self.buffer[:take], self.buffer[take:]
            self.offset = end["n"]
            return [_IRCPartition(lines)]

        def read(self, partition):
            for line in partition.lines:
                yield (line,)

        def commit(self, end):
            pass

        def stop(self):
            try:
                self.sock.close()
            except Exception:
                pass

    HAS_DATASOURCE_API = True
except Exception:  # pragma: no cover
    HAS_DATASOURCE_API = False
