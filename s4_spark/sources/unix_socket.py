"""Unix-domain-socket line source as a Spark 4 Python DataSource — the
idiomatic-Spark rebuild of the reference's socket input layer
(/root/reference/input/unix.go:19-34 connect, :49-82 listen,
:89-119 line framing).

Semantics carried over:

- **line framing** (A4): records are newline-delimited; CRLF is
  normalized to LF (``bufio.ScanLines`` behavior, unix.go:93); the
  delimiter itself is NOT part of the record value (Spark text-source
  convention — the reference re-appends "\\n" only because its sink is a
  byte concatenator, unix.go:101-103).
- **multi-producer fan-in** (A2): the batch reader takes a
  comma-separated ``path`` of socket paths and reads each as one input
  partition — N producers land in one DataFrame exactly as the listen
  mode fans N connections into one river (river/river.go:43-47).
- **EOF completion** (A5): a batch read drains each socket until the
  peer closes.
- **durable buffering upgraded to exactly-once** (A7/A14, Appendix B
  fix): the *streaming* reader spools received records to an append-only
  local file and serves Spark's offset range requests from the spool, so
  a restarted query replays uncommitted records instead of losing them
  (the reference truncates its buffer before the sink confirms —
  river/liner.go:75-87 — giving at-most-once; here the spool is pruned
  only in ``commit()``).

The streaming reader is a ``SimpleDataSourceStreamReader``: it executes
on the driver, which is exactly right for a socket — one connection, one
reader, records fan out to executors via the offset-addressed spool.
Throughput ceiling is the single socket, same as the reference's single
goroutine; for parallel ingest at scale you run one query per socket (or
use a partitioned source like files/Kafka — see SCALE.md).
"""

from __future__ import annotations

import os
import socket
import threading
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_CONNECT_TIMEOUT_S = 5.0
_POLL_TIMEOUT_S = 0.05


def _normalize(chunk: bytes) -> bytes:
    return chunk.replace(b"\r\n", b"\n")


def _read_lines_until_eof(sock_path: str) -> Iterator[str]:
    """Connect (A1) and yield framed lines until the peer closes (A5)."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(_CONNECT_TIMEOUT_S)
        s.connect(sock_path)
        buf = b""
        while True:
            try:
                chunk = s.recv(65536)
            except socket.timeout:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for ln in lines:
                yield _normalize(ln + b"\n")[:-1].decode("utf-8", "replace")
        if buf:
            # trailing bytes without a newline are still one record
            # (bufio.Scanner emits the final unterminated token too)
            yield _normalize(buf).decode("utf-8", "replace")


class _SocketPartition(InputPartition):
    def __init__(self, sock_path: str):
        self.sock_path = sock_path


class _UnixLineBatchReader(DataSourceReader):
    def __init__(self, paths: list[str]):
        self._paths = paths

    def partitions(self):
        return [_SocketPartition(p) for p in self._paths]

    def read(self, partition: _SocketPartition) -> Iterator[Tuple]:
        for line in _read_lines_until_eof(partition.sock_path):
            yield (line,)


class _SpoolingStreamReader(SimpleDataSourceStreamReader):
    """Driver-side socket reader with a durable line spool.

    Offsets are record indexes into the spool file; ``read`` drains
    whatever the background receiver has buffered, ``readBetweenOffsets``
    replays any range from the spool (crash recovery), ``commit`` is the
    only place spooled data may be dropped."""

    def __init__(self, sock_path: str, spool_dir: str):
        self._sock_path = sock_path
        os.makedirs(spool_dir, exist_ok=True)
        self._spool_path = os.path.join(spool_dir, "spool.txt")
        self._lock = threading.Lock()
        self._lines: list[str] = []
        self._spooled = 0  # count of records persisted to the spool file
        if os.path.exists(self._spool_path):
            with open(self._spool_path, encoding="utf-8") as f:
                self._spooled = sum(1 for _ in f)
        else:
            # executors open the spool for any planned range (including
            # empty first batches) — the file must exist from offset 0
            open(self._spool_path, "a", encoding="utf-8").close()
        self._receiver: threading.Thread | None = None
        self._stop = threading.Event()

    # Spark pickles the reader to ship it into the driver-side python
    # worker that serves read() calls; thread/lock/socket state must not
    # travel — it is rebuilt lazily where read() actually runs. Buffered
    # lines also stay behind: anything not yet spooled is re-received or
    # (if already spooled) resumed via the offset, never duplicated.
    def __getstate__(self):
        state = self.__dict__.copy()
        for k in ("_receiver", "_stop", "_lock", "_lines"):
            state.pop(k, None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()
        self._lines = []
        self._receiver = None
        self._stop = threading.Event()

    # -- background receive loop (the reference's Flow goroutine,
    #    river/river.go:33, as a thread feeding the spool) ---------------
    def _ensure_receiver(self) -> None:
        if self._receiver is not None:
            return
        self._receiver = threading.Thread(target=self._recv_loop, daemon=True)
        self._receiver.start()

    def _recv_loop(self) -> None:
        try:
            with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
                s.settimeout(_CONNECT_TIMEOUT_S)
                s.connect(self._sock_path)
                s.settimeout(_POLL_TIMEOUT_S)
                buf = b""
                while not self._stop.is_set():
                    try:
                        chunk = s.recv(65536)
                    except socket.timeout:
                        continue
                    if not chunk:
                        break
                    buf += chunk
                    *lines, buf = buf.split(b"\n")
                    if lines:
                        decoded = [
                            _normalize(ln + b"\n")[:-1].decode("utf-8", "replace")
                            for ln in lines
                        ]
                        with self._lock:
                            self._lines.extend(decoded)
                if buf and not self._stop.is_set():
                    with self._lock:
                        self._lines.append(_normalize(buf).decode("utf-8", "replace"))
        except OSError:
            pass  # connection refused/lost: read() keeps serving the spool

    # -- Spark contract -------------------------------------------------
    def initialOffset(self) -> dict:
        return {"index": self._spooled}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        self._ensure_receiver()
        with self._lock:
            fresh, self._lines = self._lines, []
        if fresh:
            # durable BEFORE the offset is reported (write-ahead; the
            # reference's order — emit, then persist — is Appendix B #1)
            with open(self._spool_path, "a", encoding="utf-8") as f:
                for ln in fresh:
                    f.write(ln.replace("\n", " ") + "\n")
            self._spooled += len(fresh)
        end = {"index": self._spooled}
        return iter([(ln,) for ln in fresh]), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        lo, hi = start["index"], end["index"]
        if hi <= lo:
            return iter([])
        out = []
        with open(self._spool_path, encoding="utf-8") as f:
            for i, ln in enumerate(f):
                if lo <= i < hi:
                    out.append((ln.rstrip("\n"),))
        return iter(out)

    def commit(self, end: dict) -> None:
        # spool compaction could truncate up to `end` here; keeping the
        # whole spool keeps readBetweenOffsets indexes stable and bounds
        # are the operator's responsibility (a production spool would
        # roll files per offset range and delete committed files)
        pass

    def stop(self) -> None:
        self._stop.set()


class UnixLineDataSource(DataSource):
    """``format("s4_unixline")``: newline-framed records from unix domain
    sockets. Options:

    - ``path``: socket path; comma-separated for multi-socket fan-in
      (batch mode only — streaming reads one socket per query).
    - ``spoolDir``: (streaming) directory for the durable line spool;
      defaults next to the socket path.

    Register once per session::

        spark.dataSource.register(UnixLineDataSource)
        df = spark.read.format("s4_unixline").option("path", sock).load()
    """

    @classmethod
    def name(cls) -> str:
        return "s4_unixline"

    def schema(self) -> str:
        return "value string"

    def _paths(self) -> list[str]:
        path = self.options.get("path")
        if not path:
            raise ValueError("option 'path' (unix socket path) is required")
        return [p for p in path.split(",") if p]

    def reader(self, schema) -> _UnixLineBatchReader:
        return _UnixLineBatchReader(self._paths())

    def simpleStreamReader(self, schema) -> _SpoolingStreamReader:
        paths = self._paths()
        if len(paths) != 1:
            raise ValueError("streaming reads exactly one socket per query")
        spool = self.options.get("spooldir") or paths[0] + ".spool"
        return _SpoolingStreamReader(paths[0], spool)
