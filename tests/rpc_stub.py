"""In-process JSON-RPC stub server shared by the live-RPC tests.

Plays the Ethereum provider: eth_blockNumber returns a mutable head,
eth_getLogs returns deterministic logs shaped like
pipeline/fixtures.py's raw_logs (2 marketplace events + 1 foreign-
contract event per block).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from bigquery_etl_spark.pipeline.extract import MARKETPLACE_ADDRESS
from bigquery_etl_spark.pipeline.fixtures import START_BLOCK
from bigquery_etl_spark.pipeline.schemas import RAW_LOGS_SCHEMA

COLS = [f.name for f in RAW_LOGS_SCHEMA.fields]


def logs_for_range(lo: int, hi: int) -> list[dict]:
    out = []
    for block in range(lo, hi + 1):
        for li in range(2):
            out.append(
                dict(zip(COLS, (block, li, MARKETPLACE_ADDRESS, "ListingCreated",
                                f"listing-{block}-{li}", f"Qm{block}x{li}")))
            )
        out.append(
            dict(zip(COLS, (block, 2, "0x_other_contract", "Transfer",
                            f"foreign-{block}", f"Qmfff{block}")))
        )
    return out


class RpcStub(BaseHTTPRequestHandler):
    head = START_BLOCK  # class-level mutable state, set by tests
    fail = False
    n_getlogs = 0

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls = RpcStub
        if cls.fail:
            self.send_error(500, "provider meltdown")
            return
        if body["method"] == "eth_blockNumber":
            result = cls.head
        elif body["method"] == "eth_getLogs":
            p = body["params"][0]
            cls.n_getlogs += 1
            result = logs_for_range(int(p["fromBlock"]), int(p["toBlock"]))
        else:
            self.send_error(404, "unknown method")
            return
        payload = json.dumps({"jsonrpc": "2.0", "id": body["id"], "result": result}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *args):  # silence
        pass


def start_stub() -> tuple[ThreadingHTTPServer, str]:
    """Start the stub on an ephemeral port; returns (server, url)."""
    server = ThreadingHTTPServer(("127.0.0.1", 0), RpcStub)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    RpcStub.head = START_BLOCK
    RpcStub.fail = False
    RpcStub.n_getlogs = 0
    return server, f"http://127.0.0.1:{server.server_address[1]}/"
