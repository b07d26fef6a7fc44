"""Networked transport: multi-host replacement for the in-process bus.

The reference's robots communicate over DDS; here the same topic semantics
ride a small TCP hub (the "thin async host messaging shim" of SURVEY.md §5):

- ``TransportHub`` — a broker that fans every frame out to every connected
  client (including the sender, matching DDS self-delivery; node callbacks
  already filter by robot id).
- ``NetworkBus`` — drop-in for :class:`cslam_tpu.runtime.bus.MessageBus`:
  ``publish`` sends a length-prefixed frame; a reader thread queues inbound
  frames; ``deliver`` drains them into local subscribers. All node code
  (detection front end, back end, sensor handlers) runs unchanged on top.

Frames are pickled (topic, msg, src_robot) tuples — robot swarms are a
trusted network in the reference's model too; swap ``_encode``/``_decode``
for a schema codec if that assumption changes.
"""
from __future__ import annotations

import pickle
import socket
import struct
import threading
import time
from collections import deque
from typing import Any, Dict, Optional, Tuple

from cslam_tpu.runtime.bus import MessageBus

_HEADER = struct.Struct("!I")


def _encode(topic: str, msg: Any, src_robot: int) -> bytes:
    payload = pickle.dumps((topic, msg, src_robot),
                           protocol=pickle.HIGHEST_PROTOCOL)
    return _HEADER.pack(len(payload)) + payload


def _read_frame(sock: socket.socket) -> Optional[Tuple[str, Any, int]]:
    header = _read_exact(sock, _HEADER.size)
    if header is None:
        return None
    (length,) = _HEADER.unpack(header)
    payload = _read_exact(sock, length)
    if payload is None:
        return None
    return pickle.loads(payload)


def _shutdown_close(sock: socket.socket) -> None:
    """shutdown() before close(): a bare close() while another thread is
    blocked in recv() on the same fd defers the kernel-side teardown until
    that recv returns — which it never does. shutdown() sends FIN and wakes
    the blocked reader immediately."""
    try:
        sock.shutdown(socket.SHUT_RDWR)
    except OSError:
        pass
    try:
        sock.close()
    except OSError:
        pass


def _read_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except OSError:
            return None
        if not chunk:
            return None
        buf += chunk
    return buf


class TransportHub:
    """TCP fan-out broker. One per swarm (or per simulation host)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._server = socket.create_server((host, port))
        self.address = self._server.getsockname()
        # per-client write locks: multiple reader threads (one per source
        # client) fan out to the same destination socket, and interleaved
        # partial sendall()s would corrupt the length-prefixed stream
        self._clients: Dict[socket.socket, threading.Lock] = {}
        self._lock = threading.Lock()
        self._running = True
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while self._running:
            try:
                client, _ = self._server.accept()
            except OSError:
                return
            client.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            with self._lock:
                self._clients[client] = threading.Lock()
            threading.Thread(target=self._client_loop, args=(client,),
                             daemon=True).start()

    def _client_loop(self, client: socket.socket) -> None:
        while self._running:
            frame = _read_frame(client)
            if frame is None:
                break
            data = _encode(*frame)
            with self._lock:
                targets = list(self._clients.items())
            for other, wlock in targets:
                try:
                    with wlock:
                        other.sendall(data)
                except OSError:
                    self._drop(other)
        self._drop(client)

    def _drop(self, client: socket.socket) -> None:
        with self._lock:
            self._clients.pop(client, None)
        _shutdown_close(client)

    def close(self) -> None:
        self._running = False
        _shutdown_close(self._server)
        with self._lock:
            clients = list(self._clients)
            self._clients.clear()
        for c in clients:
            _shutdown_close(c)


class NetworkBus(MessageBus):
    """MessageBus whose queue is fed by a TransportHub connection.

    The hub is a single broker (the reference's DDS is masterless); to keep
    the swarm's liveness story at least as strong as the reference's
    failure model, a dropped hub connection is NOT terminal: the reader
    thread reconnects with exponential backoff, frames published while
    disconnected land in a bounded drop-oldest buffer that is flushed on
    reconnect, and the connection state is surfaced via
    :meth:`connection_stats` so node heartbeat logic can report it.
    """

    #: outgoing frames buffered while the hub is unreachable (drop-oldest)
    PENDING_DEPTH = 1024

    def __init__(self, hub_address: Tuple[str, int],
                 reconnect: bool = True,
                 backoff_initial: float = 0.05, backoff_max: float = 2.0):
        super().__init__()
        self._address = hub_address
        self._reconnect = reconnect
        self._backoff = (backoff_initial, backoff_max)
        self._sock = self._connect()
        self.connected = True
        self.disconnects = 0
        self.reconnects = 0
        self.dropped_frames = 0
        self._pending_out: deque = deque(maxlen=self.PENDING_DEPTH)
        self._inbox: deque = deque()
        self._inbox_lock = threading.Lock()
        self._send_lock = threading.Lock()  # publish() may be multi-threaded
        self._running = True
        self._reader = threading.Thread(target=self._reader_loop, daemon=True)
        self._reader.start()

    def _connect(self) -> socket.socket:
        sock = socket.create_connection(self._address, timeout=10.0)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        sock.settimeout(None)
        return sock

    def _reader_loop(self) -> None:
        while self._running:
            frame = _read_frame(self._sock)
            if frame is not None:
                with self._inbox_lock:
                    self._inbox.append(frame)
                continue
            # connection lost (or close() shut the socket down)
            if not self._running:
                return
            with self._send_lock:
                if self.connected:  # publish() may have noticed first
                    self.connected = False
                    self.disconnects += 1
            if not self._reconnect:
                return
            delay, cap = self._backoff
            while self._running:
                try:
                    sock = self._connect()
                except OSError:
                    # hub still down: back off and retry (daemon thread, so
                    # a permanently-dead hub costs one sleeping thread)
                    time.sleep(delay)
                    delay = min(delay * 2, cap)
                    continue
                with self._send_lock:
                    self._sock = sock
                    self.connected = True
                    self.reconnects += 1
                    pending = list(self._pending_out)
                    self._pending_out.clear()
                    try:
                        for data in pending:
                            sock.sendall(data)
                    except OSError:
                        # hub died again mid-flush: requeue what's left
                        self._pending_out.extend(pending)
                        self.connected = False
                        self.disconnects += 1
                        continue
                break

    def connection_stats(self) -> Dict[str, Any]:
        """Surfaced connection state for heartbeat/metrics planes."""
        with self._send_lock:
            return {"connected": self.connected,
                    "disconnects": self.disconnects,
                    "reconnects": self.reconnects,
                    "pending_out": len(self._pending_out),
                    "dropped_frames": self.dropped_frames}

    def _buffer_out(self, data: bytes) -> None:
        # caller holds _send_lock; deque maxlen drops oldest silently, so
        # count the overflow explicitly
        if len(self._pending_out) == self._pending_out.maxlen:
            self.dropped_frames += 1
        self._pending_out.append(data)

    def publish(self, topic: str, msg: Any, src_robot: int = -1) -> None:
        data = _encode(topic, msg, src_robot)
        with self._send_lock:
            if not self.connected:
                self._buffer_out(data)
                return
            try:
                self._sock.sendall(data)
            except OSError:
                self.connected = False
                self.disconnects += 1
                self._buffer_out(data)

    def deliver(self, max_messages: int = 100000) -> int:
        with self._inbox_lock:
            pending = list(self._inbox)
            self._inbox.clear()
        for topic, msg, src in pending:
            # route through QoS bounding: best-effort topics keep only the
            # freshest `depth` frames that arrived between two delivers
            self._enqueue(topic, msg, src)
        return super().deliver(max_messages)

    def close(self) -> None:
        self._running = False
        _shutdown_close(self._sock)
