"""In-process Elasticsearch ``_bulk`` mock (stdlib only).

Implements just enough of the bulk contract for the sink tests:
``POST /_bulk`` with NDJSON action/doc pairs, per-index doc stores with
last-write-wins ``index`` and ``delete`` semantics, an ES-shaped reply
(``{"errors": bool, "items": [...]}``), and a one-shot failure switch to
exercise the sink's fail-the-batch path. Thread-safe: the sink posts from
many executor threads concurrently (ThreadingHTTPServer + one lock).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MockEs:
    """``with MockEs() as es: ... es.indices[...]`` -- starts on an
    ephemeral port; state is inspected in-process, no GET API needed."""

    def __init__(self):
        self.indices: dict[str, dict[str, dict]] = {}
        self.bulk_requests = 0
        self.bulk_bytes = 0  # total NDJSON request-body bytes received
        self.fail_next = False  # one-shot: next _bulk returns HTTP 500
        self.fail_after = None  # fail the (N+1)th request, then disarm
        self._lock = threading.Lock()
        mock = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr noise
                pass

            def do_POST(self):
                if not self.path.startswith("/_bulk"):
                    self.send_error(404)
                    return
                body = self.rfile.read(int(self.headers["Content-Length"]))
                # parse OUTSIDE the lock: only the failure switch, the
                # counters, and the store merge need mutual exclusion. The
                # pre-r14 shape parsed the whole NDJSON body under the lock,
                # which serialized concurrent executors on the mock and made
                # the es_sink bench measure the mock's convoy instead of the
                # sink (r14 note in OPTIMIZATION_r14.md).
                ops = mock._parse(body.decode("utf-8"))
                with mock._lock:
                    mock.bulk_requests += 1
                    mock.bulk_bytes += len(body)
                    if mock.fail_next or (
                        mock.fail_after is not None
                        and mock.bulk_requests > mock.fail_after
                    ):
                        mock.fail_next = False
                        mock.fail_after = None
                        self.send_error(500, "mock failure")
                        return
                    items, errors = mock._merge(ops)
                reply = json.dumps({"errors": errors, "items": items}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(reply)))
                self.end_headers()
                self.wfile.write(reply)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self._server.server_port}"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    @staticmethod
    def _parse(ndjson: str) -> list[tuple[str, str, str, str | None]]:
        """Decode one bulk body into (action, index, id, raw_doc) tuples.
        Lock-free and doc-line-parse-free: only the ~50-byte action lines
        are json.loads'd; document bodies stay raw strings (parsed lazily
        by ``snapshot``), so the request path does O(actions) small parses
        instead of O(bytes) full-document parses."""
        lines = [ln for ln in ndjson.split("\n") if ln.strip()]
        ops, i = [], 0
        while i < len(lines):
            action_obj = json.loads(lines[i])
            (action, meta), = action_obj.items()
            if action == "delete":
                ops.append((action, meta["_index"], meta["_id"], None))
                i += 1
            else:
                ops.append((action, meta["_index"], meta["_id"], lines[i + 1]))
                i += 2
        return ops

    def _merge(self, ops) -> tuple[list[dict], bool]:
        """Apply parsed ops to the store; returns (items, errors). Caller
        holds the lock -- this is the only part that touches shared state."""
        items, errors = [], False
        for action, idx, doc_id, raw in ops:
            store = self.indices.setdefault(idx, {})
            if action == "index":
                store[doc_id] = raw
                items.append({"index": {"_index": idx, "_id": doc_id, "status": 200}})
            elif action == "delete":
                found = store.pop(doc_id, None) is not None
                items.append(
                    {"delete": {"_index": idx, "_id": doc_id, "status": 200 if found else 404}}
                )
                # ES does not mark delete-of-missing as an error
            else:
                items.append({action: {"_index": idx, "_id": doc_id, "status": 400}})
                errors = True
        return items, errors

    def snapshot(self) -> dict[str, dict[str, dict]]:
        """Deep-ish copy of the index state for before/after comparisons.
        Documents are stored as raw NDJSON strings (see ``_parse``);
        snapshot parses them here so callers keep seeing dicts."""
        with self._lock:
            return {
                idx: {
                    doc_id: json.loads(raw) if isinstance(raw, str) else raw
                    for doc_id, raw in docs.items()
                }
                for idx, docs in self.indices.items()
            }

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._server.shutdown()
        self._server.server_close()
        return False
