"""Live-transport leg of S7: a TCP frame receiver with applied-LSN
acks — the loopback analog of the reference's streaming-replication
consumer (``START_REPLICATION`` COPY-BOTH with standby status
updates, ``/root/reference/tests/fuzzer/fuzzer.go:439-529``).

The reference's production path is a live socket: the walsender
pushes wire frames and the consumer answers with the LSN it has
durably applied, which is what lets the server trim WAL and resume
after disconnect.  No Postgres or Kafka exists in this sandbox, so
this module implements that *shape* end-to-end over a real socket:

* a producer connects and streams length-prefixed frames
  (``frame_seq u64 | lsn u64 | len u32 | frame bytes``, big-endian);
* the receiver lands each frame in the parquet landing zone the
  streaming runner already consumes, stamping STRICTLY INCREASING
  mtimes (the file source orders micro-batches by mtime — the
  round-1 out-of-order-delivery lesson, ``pipeline.strict_frame_order``);
* after every frame (and for ``len == 0`` keepalive probes) the
  receiver answers with the consumer's current applied-LSN
  high-watermark (``store.hwm()``) — the standby-status-update ack.
  A producer that reconnects resumes from the acked LSN and the
  watermark makes re-sent frames idempotent, exactly the reference
  fuzzer's reconnect contract (``fuzzer.go:389-391``).

Scale posture: the receiver is a relay, not an operator — one tiny
process per replication slot feeding a shared landing zone; Spark
never talks to the socket.  Parquet files are cut per ``batch_max``
frames so the file count stays bounded at any stream length.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq

_HDR = struct.Struct(">QQI")  # frame_seq, lsn, payload length
_ACK = struct.Struct(">q")    # applied LSN (signed: -1 = nothing yet)


def _recv_exact(conn: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None  # clean EOF between messages
        buf += chunk
    return buf


class LiveFrameReceiver:
    """Threaded loopback receiver; see module docstring for protocol."""

    def __init__(
        self,
        landing_dir: str,
        hwm_fn: Callable[[], int],
        host: str = "127.0.0.1",
        port: int = 0,
        batch_max: int = 64,
    ):
        self.landing_dir = landing_dir
        self.hwm_fn = hwm_fn
        self.batch_max = batch_max
        os.makedirs(landing_dir, exist_ok=True)
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.address = self._srv.getsockname()
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._file_idx = 0
        self._mtime_base = time.time()
        self.frames_received = 0
        self.errors: list[str] = []

    # ------------------------------------------------------------ lifecycle

    def start(self) -> "LiveFrameReceiver":
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        if self._thread is not None:
            self._thread.join(timeout=10)

    # ------------------------------------------------------------ internals

    def _land(self, rows: list[tuple[int, int, bytes]]) -> None:
        """One parquet file per batch, mtime strictly increasing in
        arrival order — the landing zone's ordering contract."""
        table = pa.table({
            "frame_seq": pa.array([r[0] for r in rows], pa.int64()),
            "lsn": pa.array([r[1] for r in rows], pa.int64()),
            "frame": pa.array([r[2] for r in rows], pa.binary()),
        })
        path = os.path.join(
            self.landing_dir, f"live-{self._file_idx:08d}.parquet"
        )
        pq.write_table(table, path)
        mt = self._mtime_base + self._file_idx
        os.utime(path, (mt, mt))
        self._file_idx += 1

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return  # socket closed by stop()
            with conn:
                pending: list[tuple[int, int, bytes]] = []
                try:
                    while True:
                        hdr = _recv_exact(conn, _HDR.size)
                        if hdr is None:
                            break
                        frame_seq, lsn, ln = _HDR.unpack(hdr)
                        if ln:
                            payload = _recv_exact(conn, ln)
                            if payload is None:
                                self.errors.append("EOF mid-frame")
                                break
                            pending.append((frame_seq, lsn, payload))
                            self.frames_received += 1
                            if len(pending) >= self.batch_max:
                                self._land(pending)
                                pending = []
                        else:
                            # keepalive probe: flush + ack only
                            if pending:
                                self._land(pending)
                                pending = []
                        conn.sendall(_ACK.pack(int(self.hwm_fn())))
                except OSError as exc:
                    self.errors.append(f"{type(exc).__name__}: {exc}")
                finally:
                    if pending:
                        self._land(pending)


class LiveFrameSender:
    """Producer side (the walsender stand-in for tests/fixtures):
    streams frames and reads the applied-LSN ack after each send;
    ``resume_from`` skips frames at-or-below an acked LSN, the
    reconnect contract."""

    def __init__(self, address: tuple[str, int]):
        self._sock = socket.create_connection(address, timeout=30)
        self.acks: list[int] = []

    def send(self, frame_seq: int, lsn: int, frame: bytes) -> int:
        self._sock.sendall(_HDR.pack(frame_seq, lsn, len(frame)) + frame)
        ack = _ACK.unpack(_recv_exact(self._sock, _ACK.size))[0]
        self.acks.append(ack)
        return ack

    def keepalive(self) -> int:
        """Zero-length probe: flushes the receiver's buffer and
        returns the applied-LSN ack."""
        self._sock.sendall(_HDR.pack(0, 0, 0))
        ack = _ACK.unpack(_recv_exact(self._sock, _ACK.size))[0]
        self.acks.append(ack)
        return ack

    def close(self) -> None:
        self._sock.close()
