"""Remote session layer — the analogue of the reference's
Server/Client/Protocol stack (Server.hs:17-94, Client.hs:71-117,
Protocol.hs:8-43): multi-process access to one live graph session.

The Spark driver hosting the :class:`~graph_db_spark.graph.GraphSession`
runs a :class:`GraphServer`; other processes connect with
:class:`RemoteGraphSession` and run read/write transactions over a
newline-delimited-JSON socket protocol (unix socket or TCP+credentials),
guarded by a protocol+model-version handshake.

Scale note (SURVEY §3 EP3): this is the OLTP/point-access surface — each
action is one round-trip and set-valued results are materialized lists.
Analytics belongs in-process on DataFrames; the server exists so that a
second *process* can read and mutate the same live graph, which is the
one reference capability a library-only client lacks.
"""

from graph_db_spark.remote.protocol import (
    PROTOCOL_VERSION,
    ConnectionFailure,
    CorruptRequest,
    Incompatible,
    RemoteFailure,
    ServerIsBusy,
    Unauthenticated,
    UnreachableURL,
)
from graph_db_spark.remote.client import RemoteGraphSession, RemoteTx
from graph_db_spark.remote.server import GraphServer

__all__ = [
    "PROTOCOL_VERSION",
    "GraphServer",
    "RemoteGraphSession",
    "RemoteTx",
    "RemoteFailure",
    "UnreachableURL",
    "ServerIsBusy",
    "Unauthenticated",
    "Incompatible",
    "ConnectionFailure",
    "CorruptRequest",
]
