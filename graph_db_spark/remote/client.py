"""RemoteGraphSession — client side of the remote session layer.

Behavioral analogue of Client.hs:71-117 + GraphDB.hs:160-232's
runClientSession: connect to a :class:`~graph_db_spark.remote.server.
GraphServer` by unix-socket path or (host, port, credentials), handshake
protocol+model versions, then run transactions::

    with RemoteGraphSession(socket_path=p, model_version=3) as db:
        def prog(tx):
            root = tx.get_root()
            a = tx.new_node("Artist", name="X", uid=7)
            tx.add_target(root, a)
            return tx.get_targets(root, "Catalogue_Artist_Name", "X")
        refs = db.write(prog)

Node handles inside a transaction are opaque ints scoped to that
transaction (the server's ref vector) — exactly the reference's client
node semantics (``SessionNode ClientSession u = Int``, GraphDB.hs:163).

Failures raise the taxonomy in :mod:`graph_db_spark.remote.protocol`:
UnreachableURL / ServerIsBusy / Unauthenticated / Incompatible /
ConnectionFailure / CorruptRequest (GraphDB.hs:184-208).
"""

from __future__ import annotations

import socket

from graph_db_spark.remote import protocol as P


class RemoteTx:
    """The 9-op transaction surface, each op one request round-trip
    (Client.hs:71-117's runAction)."""

    def __init__(self, session: "RemoteGraphSession", write: bool):
        self._s = session
        self._write = write

    @staticmethod
    def _raise_error(r: dict) -> None:
        """Uniform ERROR-frame decoding — the same taxonomy whether the
        error is the first reply or arrives mid-chunk-stream."""
        if r.get("code") == "corrupt":
            raise P.CorruptRequest(r.get("error", ""))
        raise RuntimeError(r.get("error", "remote operation failed"))

    def _act(self, op: str, **kw) -> dict:
        r = self._s._request({"t": P.ACTION, "op": op, **kw})
        if r.get("t") == P.ERROR:
            self._raise_error(r)
        return r

    def _act_unit(self, op: str, **kw) -> None:
        """A result-less (UNIT-reply) op. With ``pipeline > 1`` on the
        session it is SENT without waiting for its reply — the reply is
        consumed, in order, at the next result-bearing op, at the
        pipeline cap, or at Finish. Same frames on the wire (full
        compatibility with a per-op server, Client.hs:71-117); only the
        client's wait pattern changes, so N mutations cost ~1 round-trip
        instead of N. A buffered op's ERROR surfaces at that drain point
        (still inside the transaction, which aborts as usual)."""
        if self._write and self._s._pipeline > 1:
            self._s._send_pipelined({"t": P.ACTION, "op": op, **kw})
        else:
            self._act(op, **kw)

    def get_root(self) -> int:
        return self._act(P.GET_ROOT)["ref"]

    def new_node(self, kind: str, **payload) -> int:
        return self._act(P.NEW_NODE, kind=kind, value=payload)["ref"]

    def get_value(self, ref: int) -> dict | None:
        return self._act(P.GET_VALUE, ref=ref)["value"]

    def set_value(self, ref: int, kind: str, **payload) -> None:
        self._act_unit(P.SET_VALUE, ref=ref, kind=kind, value=payload)

    def _collect_node_list(self, r: dict) -> list[int]:
        # The server streams large fan-outs: zero or more NODE_LIST_CHUNK
        # messages, then the terminal NODE_LIST with the tail.
        refs: list[int] = []
        while r.get("t") == P.NODE_LIST_CHUNK:
            refs.extend(r["refs"])
            r = self._s._read_reply()
            if r.get("t") == P.ERROR:
                self._raise_error(r)
        refs.extend(r.get("refs", []))
        return refs

    def get_targets(self, ref: int, idx_tag: str, idx_key=None) -> list[int]:
        return self._collect_node_list(
            self._act(P.GET_TARGETS, ref=ref, idx_tag=idx_tag, idx_key=idx_key)
        )

    def walk(self, ref: int, steps) -> list[int]:
        """Run a whole get_targets CHAIN server-side in ONE request
        (protocol WALK, v3): *steps* is an iterable of index tags, or
        (idx_tag, idx_key) pairs for keyed hops. Returns the final
        frontier's refs; intermediate frontiers never cross the wire —
        an N-hop traversal costs one round-trip instead of N, and on the
        server the chain composes into a single lazy Spark plan. This is
        the scale-correct client for chained navigation (SURVEY §3:
        ship the program to the data)."""
        norm = [
            {"idx_tag": s} if isinstance(s, str) else {"idx_tag": s[0], "idx_key": s[1]}
            for s in steps
        ]
        return self._collect_node_list(self._act(P.WALK, ref=ref, steps=norm))

    def add_target(self, src: int, dst: int) -> None:
        self._act_unit(P.ADD_TARGET, src=src, dst=dst)

    def remove_target(self, src: int, dst: int) -> None:
        self._act_unit(P.REMOVE_TARGET, src=src, dst=dst)

    def remove(self, ref: int) -> None:
        self._act_unit(P.REMOVE, ref=ref)

    def get_stats(self) -> tuple[int, int, int]:
        return tuple(self._act(P.GET_STATS)["stats"])


class RemoteGraphSession:
    """A connection to a GraphServer; run transactions with
    :meth:`read` / :meth:`write` (or :meth:`run_transaction`)."""

    def __init__(
        self,
        socket_path: str | None = None,
        host: str = "127.0.0.1",
        port: int | None = None,
        credentials=None,
        model_version: int = 0,
        timeout: float = 600.0,
        pipeline: int = 1,
    ):
        """*pipeline*: max result-less write ops in flight before the
        client waits for their (ordered) replies — OLTP latency batching
        with unchanged wire frames. 1 = classic per-op round-trips."""
        if (socket_path is None) == (port is None):
            raise ValueError("exactly one of socket_path / port required")
        self._pipeline = max(1, int(pipeline))
        self._pending = 0
        self._batched_ops = 0  # observability: ops that skipped a sync wait
        try:
            if socket_path is not None:
                self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                self._sock.settimeout(timeout)
                self._sock.connect(socket_path)
            else:
                self._sock = socket.create_connection((host, port), timeout=timeout)
        except OSError as exc:
            raise P.UnreachableURL(str(exc)) from exc
        self._reader = P.MessageReader(self._sock)
        P.send_msg(
            self._sock,
            {
                "protocol": P.PROTOCOL_VERSION,
                "model": model_version,
                "credentials": credentials,
            },
        )
        reply = self._reader.read()
        if reply is None:
            raise P.ConnectionFailure("server closed during handshake")
        if not reply.get("ok"):
            raise P.HANDSHAKE_FAILURES.get(reply.get("code"), P.ConnectionFailure)(
                f"handshake rejected: {reply.get('code')}"
            )

    # -- plumbing ----------------------------------------------------------

    def _send_pipelined(self, msg: dict) -> None:
        """Send without waiting; replies are drained in order at the cap
        or before the next synchronous request."""
        P.send_msg(self._sock, msg)
        self._pending += 1
        self._batched_ops += 1
        if self._pending >= self._pipeline:
            self._drain_pending()

    def _drain_pending(self) -> None:
        """Consume every outstanding pipelined reply (ordered — the
        server answers one connection sequentially). The FIRST buffered
        ERROR is raised after the stream is fully consumed, so the
        connection is never left mid-stream."""
        err = None
        while self._pending:
            r = self._read_reply()
            self._pending -= 1
            if r.get("t") == P.ERROR and err is None:
                err = r
        if err is not None:
            RemoteTx._raise_error(err)

    def _request(self, msg: dict) -> dict:
        self._drain_pending()
        P.send_msg(self._sock, msg)
        return self._read_reply()

    def _read_reply(self) -> dict:
        reply = self._reader.read()
        if reply is None:
            raise P.ConnectionFailure("server closed connection")
        return reply

    # -- transactions (GraphDB.hs:432-449 runTransaction semantics) --------

    def run_transaction(self, write: bool, fn):
        """Start a tx, run *fn(RemoteTx)*, Finish (commit if write).
        The whole tx holds the server's read/write admission, so writes
        are exclusive and reads see one consistent snapshot."""
        r = self._request({"t": P.START, "write": bool(write)})
        if r.get("t") == P.ERROR:
            raise P.CorruptRequest(r.get("error", ""))
        try:
            result = fn(RemoteTx(self, write))
        except BaseException:
            if write:
                # best-effort rollback: Finish on a write tx would commit
                # the staged prefix, so drop the connection — the server
                # discards uncommitted state on disconnect.
                self.close()
            else:
                # a read tx has nothing to roll back: Finish releases the
                # server-side admission and the connection stays usable
                # for subsequent transactions.
                try:
                    self._request({"t": P.FINISH})
                except Exception:  # connection already broken — give up on it
                    self.close()
            raise
        try:
            r = self._request({"t": P.FINISH})
        except BaseException:
            # A buffered pipelined-op ERROR can first surface in the
            # drain that precedes FINISH. The tx is aborting and FINISH
            # was never sent — the server still holds the admission, so
            # drop the connection (discarding staged write state) exactly
            # like an fn-raised abort; otherwise the write lock stays
            # held until this object is GC'd.
            self.close()
            raise
        if r.get("t") == P.ERROR:
            raise RuntimeError(r.get("error", "commit failed"))
        return result

    def read(self, fn):
        return self.run_transaction(False, fn)

    def write(self, fn):
        return self.run_transaction(True, fn)

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "RemoteGraphSession":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
