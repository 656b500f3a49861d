"""CLI entry point — the reference's launch surface, rebuilt.

The reference is started as (``TwitchStream.scala:27-35``)::

    TwitchStream <channel> <batchDuration> <language> <nick> <oauth>

and runs the streaming job until interrupted, snapshotting word and
category counts per micro-batch. This module mirrors that:

    python -m spark_streaming_twitch_analytics_spark CHANNEL BATCH_SECONDS [LANGUAGE]
        [--source {rate,file,live}] [--dir DIR] [--store STORE]
        [--nick NICK] [--oauth TOKEN] [--max-batches N]

Differences from the reference, by design:

- the sink is the pluggable KV table store (parquet-backed by default)
  instead of Redis — tables ``<channel>_wordcount`` and
  ``<channel>_categoryCount``, same names as ``SparkRunner.scala:135,152``;
- ``language`` actually takes effect (the reference hardcoded French
  stopwords despite the CLI arg — SURVEY N3);
- the default source is the deterministic ``rate`` simulator so the
  pipeline runs without network access; ``--source live`` uses the
  Python DataSource IRC client (needs network + a real channel);
- classification uses the deterministic hash scorer (the reference's
  TF-Serving endpoint is environment-specific; swap the scorer to
  integrate a real model).
"""

from __future__ import annotations

import argparse
import sys

from .functions.scoring import decode_categories, hash_scores
from .session import get_spark
from .sources import irc
from .sources.kv_store import KVTableStore
from .streaming.wordcount import run_dual_branch_query


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spark_streaming_twitch_analytics_spark")
    ap.add_argument("channel", help="channel name (table prefix; IRC channel for --source live)")
    ap.add_argument("batch_seconds", type=int, help="micro-batch trigger interval")
    ap.add_argument(
        "language", nargs="?", default="english",
        choices=["english", "french", "en", "fr"],
        help="stopword language (the reference hardcoded French; here it works)",
    )
    ap.add_argument("--source", choices=["rate", "file", "live"], default="rate")
    ap.add_argument("--dir", default="/tmp/spark_streaming_twitch_analytics_spark/in", help="input dir for --source file")
    ap.add_argument("--store", default="/tmp/spark_streaming_twitch_analytics_spark/store", help="KV store root")
    ap.add_argument("--nick", default="justinfan12345", help="IRC nick for --source live")
    ap.add_argument("--oauth", default="", help="IRC oauth token for --source live")
    ap.add_argument(
        "--max-batches", type=int, default=0,
        help="stop after N micro-batches (0 = run until interrupted)",
    )
    args = ap.parse_args(argv)
    lang = {"english": "en", "french": "fr"}.get(args.language, args.language)

    from pyspark.sql import SparkSession

    # get_spark is getOrCreate: when embedded (tests, notebooks) we join
    # an existing session and must NOT stop it on exit
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name=f"twitch-{args.channel}")
    if args.source == "rate":
        raw = irc.rate_source_lines(spark, channel=args.channel)
    elif args.source == "file":
        raw = irc.file_line_source(spark, args.dir)
    else:
        if not irc.HAS_DATASOURCE_API:
            print("live source needs the Spark 4 Python DataSource API", file=sys.stderr)
            return 2
        spark.dataSource.register(irc.IRCSocketDataSource)
        raw = (
            spark.readStream.format("irc_chat")
            .option("channel", args.channel)
            .option("nick", args.nick)
            .option("token", args.oauth)
            .load()
        )

    store = KVTableStore(spark, args.store)

    def scores_to_cats(text_col):
        return decode_categories(hash_scores(text_col))

    query = run_dual_branch_query(
        raw,
        store,
        scores_to_cats,
        checkpoint_dir=store.checkpoint_dir(f"{args.channel}_dual"),
        word_table=f"{args.channel}_wordcount",
        cat_table=f"{args.channel}_categoryCount",
        lang=lang,
        batch_interval=f"{args.batch_seconds} seconds",
    )
    try:
        idle, last_batch = 0, -1
        while query.isActive:
            query.awaitTermination(max(args.batch_seconds, 1))
            lp = query.lastProgress
            batch = lp["batchId"] if lp else -1
            idle, last_batch = (idle + 1, last_batch) if batch == last_batch else (0, batch)
            done = lp is not None and batch + 1 >= args.max_batches
            if args.max_batches and (done or (idle >= 3 and batch >= 0)):
                # wait out any in-flight trigger so stop() never interrupts
                # a sink write mid-flight (processAllAvailable would never
                # return on a continuous source like rate)
                import time as _time

                deadline = _time.time() + 30
                while query.status["isTriggerActive"] and _time.time() < deadline:
                    _time.sleep(0.2)
                break
        if query.exception() is not None:
            print(query.exception(), file=sys.stderr)
            return 1
        return 0
    except KeyboardInterrupt:
        return 0
    finally:
        # graceful shutdown (reference ST8, DStreamTests.sc:156-162)
        query.stop()
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
