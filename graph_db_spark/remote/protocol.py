"""Wire protocol for the remote session layer.

Mirrors Protocol.hs:8-43 behaviorally: a request is Start(write) /
Finish / Action(op), a response is Unit / Node / Value / NodeList /
Stats; node references are per-transaction dense ints minted by the
server (Server.hs:22-26's ref vector), never raw node ids — a client
can only name nodes it has been handed inside the current transaction.

Encoding is length-unbounded newline-delimited JSON (one message per
line, UTF-8). JSON rather than a binary codec because every value that
crosses the wire is already JSON-shaped (payload dicts, index keys,
counts); the hot path of the engine never touches this layer.

Failure taxonomy copies GraphDB.hs:184-208's ClientFailure so callers
can catch the same conditions by the same names.
"""

from __future__ import annotations

import json
import socket

# v2: GET_TARGETS replies stream NODE_LIST_CHUNK frames before the
# terminal NODE_LIST (a wire-format change — a v1 client would read the
# first chunk as the whole answer and desync on the unread frames, which
# is exactly what the handshake exists to reject).
# v3: WALK — a whole get_targets CHAIN in one request (the ship-the-
# program shape; a v3 client on a v2 server would get CorruptRequest
# mid-transaction, so the handshake rejects the pairing up front).
PROTOCOL_VERSION = 3

# -- request kinds ----------------------------------------------------------
START = "start"
FINISH = "finish"
ACTION = "action"

# -- action ops (Protocol.hs:19-29) -----------------------------------------
NEW_NODE = "new_node"
GET_VALUE = "get_value"
SET_VALUE = "set_value"
GET_ROOT = "get_root"
GET_TARGETS = "get_targets"
ADD_TARGET = "add_target"
REMOVE_TARGET = "remove_target"
REMOVE = "remove"
GET_STATS = "get_stats"
# Chained traversal executed server-side: {"op": "walk", "ref": R,
# "steps": [{"idx_tag": T, "idx_key": K|null}, ...]} — one request for a
# whole frontier chain instead of one round-trip per hop. The reply is
# the FINAL frontier only, streamed like GET_TARGETS; intermediate
# frontiers never cross the wire (and never materialize on the server —
# the chain stays one lazy Spark plan).
WALK = "walk"

# -- response kinds (Protocol.hs:34-41) -------------------------------------
UNIT = "unit"
NODE = "node"
VALUE = "value"
NODE_LIST = "node_list"
# Streaming prefix of a NODE_LIST: zero or more chunks followed by the
# terminal NODE_LIST carrying the tail. Keeps a hub node's fan-out from
# buffering entirely on the server or in one wire message.
NODE_LIST_CHUNK = "node_list_chunk"
STATS = "stats"
ERROR = "error"


class RemoteFailure(Exception):
    """Base of the client-visible failure taxonomy (GraphDB.hs:184-208)."""


class UnreachableURL(RemoteFailure):
    """Unable to connect to the provided url."""


class ServerIsBusy(RemoteFailure):
    """The server is at max clients; retry later."""


class Unauthenticated(RemoteFailure):
    """Incorrect credentials."""


class Incompatible(RemoteFailure):
    """Protocol or graph-model version mismatch with the server."""


class ConnectionFailure(RemoteFailure):
    """Connection interrupted or timed out."""


class CorruptRequest(RemoteFailure):
    """The server could not decode the request."""


# handshake reply codes → client exceptions
HANDSHAKE_FAILURES = {
    "busy": ServerIsBusy,
    "unauthenticated": Unauthenticated,
    "incompatible": Incompatible,
}


def send_msg(sock: socket.socket, msg: dict) -> None:
    try:
        sock.sendall(json.dumps(msg, separators=(",", ":")).encode() + b"\n")
    except OSError as exc:
        raise ConnectionFailure(str(exc)) from exc


class MessageReader:
    """Buffered line reader over a socket (one JSON message per line)."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""

    def read(self) -> dict | None:
        """Next message, or None on clean EOF. Raises ConnectionFailure on
        timeout/reset, CorruptRequest on undecodable input."""
        while b"\n" not in self._buf:
            try:
                chunk = self._sock.recv(65536)
            except (TimeoutError, socket.timeout) as exc:
                raise ConnectionFailure("timeout") from exc
            except OSError as exc:
                raise ConnectionFailure(str(exc)) from exc
            if not chunk:
                if self._buf:
                    raise ConnectionFailure("EOF mid-message")
                return None
            self._buf += chunk
        line, self._buf = self._buf.split(b"\n", 1)
        try:
            msg = json.loads(line)
        except ValueError as exc:
            raise CorruptRequest(str(exc)) from exc
        if not isinstance(msg, dict):
            raise CorruptRequest(f"expected object, got {type(msg).__name__}")
        return msg
