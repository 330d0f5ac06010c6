"""HTTP client for a remote graph sidecar.

Speaks the reference sidecar's contract (``neo4j/server.py:131-185``):
``GET /schema``, ``POST /run_query {query, parameters}``,
``POST /add_instances {instances: [{query, parameters}]}``,
``POST /add_csv``, ``GET /close_db`` — so an existing Neo4j deployment keeps
working while the native ``PropertyGraph`` is the in-process default.
Exposes the same .schema()/.run()/.add_instances() surface as
PropertyGraph, so GraphRetriever is backend-agnostic.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


class RemoteGraphClient:
    def __init__(self, base_url: str, timeout: int = 30):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _requests(self):
        import requests
        return requests

    def schema(self) -> dict:
        r = self._requests().get(self.base_url + "/schema", timeout=self.timeout)
        r.raise_for_status()
        return r.json()

    def run(self, query: str, parameters: Optional[dict] = None) -> List[dict]:
        r = self._requests().post(
            self.base_url + "/run_query",
            json={"query": query, "parameters": parameters or {}},
            timeout=self.timeout)
        r.raise_for_status()
        body = r.json()
        return body.get("result", body if isinstance(body, list) else [])

    def add_instances(self, instances: Sequence[dict]) -> int:
        r = self._requests().post(
            self.base_url + "/add_instances",
            json={"instances": list(instances)}, timeout=self.timeout)
        r.raise_for_status()
        return len(instances)

    def add_csv(self, rows: Sequence[dict]) -> int:
        r = self._requests().post(self.base_url + "/add_csv",
                                  json={"rows": list(rows)},
                                  timeout=self.timeout)
        r.raise_for_status()
        return len(rows)

    def close(self) -> None:
        try:
            self._requests().get(self.base_url + "/close_db",
                                 timeout=self.timeout)
        except Exception:
            pass
