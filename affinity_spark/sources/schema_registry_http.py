"""HTTP (Confluent-style) schema-registry client over an injected transport.

The reference ships three registry impls (memory / local-file / HTTP —
``avro/src/main/scala/io/amient/affinity/avro/HttpSchemaRegistry.scala:95-150``);
the repo so far had only the in-memory ``SchemaRegistry``. This client
speaks the same REST surface the reference's ``HttpSchemaRegistryClient``
does — ``GET /subjects``, ``GET /subjects/{s}/versions``,
``GET /subjects/{s}/versions/{v}``, ``GET /schemas/ids/{id}``,
``POST /subjects/{s}/versions`` — with the same error convention (payloads
carrying ``error_code``; 40401 subject-not-found maps to an empty listing,
anything else raises).

The transport is injected (``transport(method, path, body) -> response
text``), so the client is fully testable with no server, and a real
``urllib``-based transport is one call away (``urllib_transport``). An
id→schema cache makes repeated ``schema(id)`` lookups free — the property
the reference's serde relies on for per-record reads — and the cached view
satisfies the same ``register/schema/ids`` contract the envelope decode
helpers (``avro_envelope.decode_enveloped``) expect from the in-memory
registry.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

Transport = Callable[[str, str, str | None], str]

SUBJECT_NOT_FOUND = 40401


class RegistryError(RuntimeError):
    def __init__(self, error_code: int, message: str):
        super().__init__(f"registry error {error_code}: {message}")
        self.error_code = error_code


def urllib_transport(base_url: str) -> Transport:
    """Real-network transport for when a registry is reachable; the client
    itself never imports urllib so tests stay offline."""
    import urllib.request

    def _call(method: str, path: str, body: str | None = None) -> str:
        req = urllib.request.Request(
            base_url.rstrip("/") + path,
            data=body.encode() if body is not None else None,
            method=method,
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310 - explicit opt-in
            return resp.read().decode()

    return _call


class HttpSchemaRegistry:
    """Registry client + cache; satisfies the envelope layer's registry
    contract (``register``/``schema``/``ids``) over HTTP."""

    def __init__(self, transport: Transport, default_subject: str = "default"):
        self._transport = transport
        self._default_subject = default_subject
        self._by_id: dict[int, str] = {}
        self._id_by_canonical: dict[str, int] = {}

    # -- raw REST surface (reference HttpSchemaRegistryClient:95-150) ------

    def get_subjects(self) -> Iterator[str]:
        j = self._get("/subjects")
        if self._not_found(j):
            return iter(())
        return iter(j)

    def get_versions(self, subject: str) -> Iterator[int]:
        j = self._get(f"/subjects/{subject}/versions")
        if self._not_found(j):
            return iter(())
        return iter(j)

    def get_schema_version(self, subject: str, version: int) -> tuple[int, str]:
        j = self._get(f"/subjects/{subject}/versions/{version}")
        self._raise_on_error(j)
        sid, schema = int(j["id"]), j["schema"]
        self._cache(sid, schema)
        return sid, schema

    def get_schema_by_id(self, schema_id: int) -> str:
        if schema_id in self._by_id:
            return self._by_id[schema_id]
        j = self._get(f"/schemas/ids/{schema_id}")
        self._raise_on_error(j)
        self._cache(schema_id, j["schema"])
        return self._by_id[schema_id]

    def register_schema(self, subject: str, schema_json: str) -> int:
        canonical = _canonical(schema_json)
        if canonical in self._id_by_canonical:
            return self._id_by_canonical[canonical]
        body = json.dumps({"schema": schema_json})
        j = json.loads(
            self._transport("POST", f"/subjects/{subject}/versions", body)
        )
        self._raise_on_error(j)
        if "id" not in j:
            raise RegistryError(-1, f"no id in registration response: {j}")
        sid = int(j["id"])
        self._cache(sid, schema_json)
        return sid

    # -- in-memory-registry-compatible contract (avro_envelope) -------------

    def register(self, schema_json: str) -> int:
        return self.register_schema(self._default_subject, schema_json)

    def schema(self, schema_id: int) -> str:
        return self.get_schema_by_id(schema_id)

    def ids(self) -> list[int]:
        """Known (cached) schema ids. The REST surface has no global schema
        listing, so the decode path works over the prefetched/registered
        set — call :meth:`prefetch_subject` to pull a subject's full
        history before decoding a mixed-writer log."""
        return sorted(self._by_id)

    def prefetch_subject(self, subject: str | None = None) -> list[int]:
        subject = subject or self._default_subject
        out = []
        for v in self.get_versions(subject):
            sid, _ = self.get_schema_version(subject, int(v))
            out.append(sid)
        return out

    # -- internals -----------------------------------------------------------

    def _get(self, path: str):
        return json.loads(self._transport("GET", path, None))

    def _cache(self, sid: int, schema_json: str) -> None:
        self._by_id[sid] = schema_json
        self._id_by_canonical[_canonical(schema_json)] = sid

    @staticmethod
    def _not_found(j) -> bool:
        if isinstance(j, dict) and "error_code" in j:
            if int(j["error_code"]) == SUBJECT_NOT_FOUND:
                return True
            raise RegistryError(int(j["error_code"]), j.get("message", ""))
        return False

    @staticmethod
    def _raise_on_error(j) -> None:
        if isinstance(j, dict) and "error_code" in j:
            raise RegistryError(int(j["error_code"]), j.get("message", ""))


def _canonical(schema_json: str) -> str:
    return json.dumps(json.loads(schema_json), sort_keys=True, separators=(",", ":"))


class MockRegistryServer:
    """In-process Confluent-shaped registry for tests: the server side of
    the transport contract, with call counting for cache assertions."""

    def __init__(self) -> None:
        self._schemas: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next = 1
        self.calls: list[tuple[str, str]] = []

    def transport(self) -> Transport:
        def _call(method: str, path: str, body: str | None = None) -> str:
            self.calls.append((method, path))
            return json.dumps(self._handle(method, path, body))

        return _call

    def _handle(self, method: str, path: str, body: str | None):
        parts = [p for p in path.split("/") if p]
        if method == "GET" and parts == ["subjects"]:
            return sorted(self._subjects)
        if method == "GET" and len(parts) == 3 and parts[0] == "subjects":
            subject = parts[1]
            if subject not in self._subjects:
                return {"error_code": SUBJECT_NOT_FOUND, "message": "not found"}
            return list(range(1, len(self._subjects[subject]) + 1))
        if method == "GET" and len(parts) == 4 and parts[0] == "subjects":
            subject, version = parts[1], int(parts[3])
            versions = self._subjects.get(subject, [])
            if not 1 <= version <= len(versions):
                return {"error_code": 40402, "message": "version not found"}
            sid = versions[version - 1]
            return {"id": sid, "version": version, "schema": self._schemas[sid]}
        if method == "GET" and parts[:2] == ["schemas", "ids"]:
            sid = int(parts[2])
            if sid not in self._schemas:
                return {"error_code": 40403, "message": "schema not found"}
            return {"schema": self._schemas[sid]}
        if method == "POST" and len(parts) == 3 and parts[0] == "subjects":
            subject = parts[1]
            schema_json = json.loads(body)["schema"]
            canonical = _canonical(schema_json)
            for sid, s in self._schemas.items():
                if _canonical(s) == canonical:
                    if sid not in self._subjects.setdefault(subject, []):
                        self._subjects[subject].append(sid)
                    return {"id": sid}
            sid = self._next
            self._next += 1
            self._schemas[sid] = schema_json
            self._subjects.setdefault(subject, []).append(sid)
            return {"id": sid}
        return {"error_code": 404, "message": f"no route {method} {path}"}
