"""Minimal file-backed fake of the redis-py client surface used by
:class:`.redis_store.RedisKVTableStore` — hset / hgetall / delete /
expire / scan_iter / pipeline.

Why file-backed rather than a dict: the store's write path runs
``foreachPartition`` inside Spark's Python WORKER processes, so an
in-memory fake in the driver would never see the writes. One file per
Redis key (named by key digest, key stored inside) makes concurrent
partition writers touching DISTINCT keys safe (distinct files). Known
divergence from real Redis: ``hset`` here is a read-modify-replace of
the whole record, so two writers hset-ing the SAME key concurrently are
last-wins and may lose the other's fields, where Redis would atomically
merge them. Test workloads therefore keep writers distinctly keyed
(the store's writer deletes+rewrites whole rows, so it never relies on
field-level merge).

This mirrors the public ``fakeredis`` idea (a standard test pattern for
redis-py code) without adding a dependency; it exists for tests and
server-less dev, not production.
"""

from __future__ import annotations

import fnmatch
import hashlib
import json
import os
import time


class DirFakeRedis:
    def __init__(self, root: str, clock=time.time):
        # ``clock`` governs TTL expiry checks; injectable so tests can
        # advance time instead of sleeping (worker-side instances keep
        # the real clock — only the driver's reader needs to time-travel)
        self.root = root
        self._clock = clock
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, hashlib.md5(key.encode()).hexdigest() + ".json")

    def _load(self, key: str) -> dict | None:
        try:
            with open(self._path(key)) as f:
                rec = json.load(f)
        except Exception:
            return None
        if rec.get("expire_at") and self._clock() > rec["expire_at"]:
            return None
        return rec

    def _store(self, key: str, rec: dict) -> None:
        tmp = self._path(key) + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(key))

    # -- redis-py surface ---------------------------------------------------

    def hset(self, key: str, mapping: dict) -> int:
        rec = self._load(key) or {"key": key, "hash": {}, "expire_at": None}
        rec["hash"].update({k: str(v) for k, v in mapping.items()})
        self._store(key, rec)
        return len(mapping)

    def hgetall(self, key: str) -> dict:
        rec = self._load(key)
        return dict(rec["hash"]) if rec else {}

    def delete(self, *keys: str) -> int:
        n = 0
        for key in keys:
            try:
                os.remove(self._path(key))
                n += 1
            except FileNotFoundError:
                pass
        return n

    def expire(self, key: str, ttl: int) -> bool:
        rec = self._load(key)
        if rec is None:
            return False
        rec["expire_at"] = self._clock() + ttl
        self._store(key, rec)
        return True

    def scan_iter(self, match: str = "*", count: int = 1000):
        for fname in os.listdir(self.root):
            if not fname.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.root, fname)) as f:
                    rec = json.load(f)
            except Exception:
                continue
            if rec.get("expire_at") and self._clock() > rec["expire_at"]:
                continue
            if fnmatch.fnmatch(rec["key"], match):
                yield rec["key"]

    def pipeline(self, transaction: bool = False):
        return _FakePipeline(self)


class _FakePipeline:
    def __init__(self, client: DirFakeRedis):
        self._client = client
        self._ops: list[tuple] = []

    def hset(self, key, mapping):
        self._ops.append(("hset", (key,), {"mapping": mapping}))
        return self

    def hgetall(self, key):
        self._ops.append(("hgetall", (key,), {}))
        return self

    def delete(self, *keys):
        self._ops.append(("delete", keys, {}))
        return self

    def expire(self, key, ttl):
        self._ops.append(("expire", (key, ttl), {}))
        return self

    def execute(self):
        out = [getattr(self._client, op)(*a, **kw) for op, a, kw in self._ops]
        self._ops = []
        return out
