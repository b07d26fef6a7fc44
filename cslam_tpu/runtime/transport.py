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
        try:
            client.close()
        except OSError:
            pass

    def close(self) -> None:
        self._running = False
        try:
            self._server.close()
        except OSError:
            pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()


class NetworkBus(MessageBus):
    """MessageBus whose queue is fed by a TransportHub connection."""

    def __init__(self, hub_address: Tuple[str, int]):
        super().__init__()
        self._sock = socket.create_connection(hub_address, timeout=10.0)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock.settimeout(None)
        self._inbox: deque = deque()
        self._inbox_lock = threading.Lock()
        self._send_lock = threading.Lock()  # publish() may be multi-threaded
        self._running = True
        self._reader = threading.Thread(target=self._reader_loop, daemon=True)
        self._reader.start()

    def _reader_loop(self) -> None:
        while self._running:
            frame = _read_frame(self._sock)
            if frame is None:
                return
            with self._inbox_lock:
                self._inbox.append(frame)

    def publish(self, topic: str, msg: Any, src_robot: int = -1) -> None:
        data = _encode(topic, msg, src_robot)
        with self._send_lock:
            self._sock.sendall(data)

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
        try:
            self._sock.close()
        except OSError:
            pass
