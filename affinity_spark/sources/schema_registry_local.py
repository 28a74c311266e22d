"""File-backed schema registry mirroring the reference's LocalSchemaRegistry.

The reference ships three registry backends — memory, HTTP, and a local
filesystem one (``avro/src/main/scala/io/amient/affinity/avro/
LocalSchemaRegistry.scala``) — the last being what an airgapped batch
deployment uses: no server, schemas shared through a directory. Layout is
the reference's exactly:

- ``{id}.avsc``      one file per registered schema (pretty-printed JSON);
                     id allocation = the smallest non-negative integer
                     whose ``.avsc`` file does not exist yet
                     (LocalSchemaRegistry.scala:86);
- ``{subject}.dat``  comma-separated schema ids registered under the
                     subject, append-ordered = version order
                     (LocalSchemaRegistry.scala:77-91);
- ``.lock``          registration runs under an exclusive-create lock file
                     (the reference's ``hypersynchronized``,
                     LocalSchemaRegistry.scala:96-114), so two writers
                     racing a registration cannot allocate one id twice.

Satisfies the same duck-typed contract the envelope codec layer
(``functions/avro_envelope.py``) expects from any registry —
``register(schema_json) -> id``, ``schema(id) -> canonical json``,
``ids()`` — so it drops into ``decode_enveloped``/``encode_enveloped_python``
wherever the in-memory registry does. Dedup is per subject, like the
reference: re-registering a subject's existing schema returns its id.
"""

from __future__ import annotations

import json
import os
import time


class RegistryLockTimeout(RuntimeError):
    """The registration lock stayed held past the timeout."""


def _canonical(schema_json: str) -> str:
    return json.dumps(json.loads(schema_json), sort_keys=True, separators=(",", ":"))


class LocalSchemaRegistry:
    def __init__(
        self,
        data_path: str,
        default_subject: str = "default",
        lock_timeout_s: float = 10.0,
    ) -> None:
        self.data_path = data_path
        self.default_subject = default_subject
        self.lock_timeout_s = lock_timeout_s
        os.makedirs(data_path, exist_ok=True)
        self._cache: dict[int, str] = {}  # id -> canonical json

    # -- locking (reference hypersynchronized) -----------------------------

    def _acquire_lock(self) -> None:
        import uuid

        lock = os.path.join(self.data_path, ".lock")
        deadline = time.time() + self.lock_timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return
            except FileExistsError:
                try:
                    # break locks abandoned by dead writers (mtime-aged).
                    # The steal is an atomic RENAME, not unlink: two waiters
                    # that both saw the stale mtime race the rename, exactly
                    # one wins, and the loser's rename raises — an unlink
                    # here could delete a FRESH lock another waiter just
                    # created between our stat and our unlink, letting two
                    # writers into the critical section.
                    if time.time() - os.path.getmtime(lock) > 60:
                        stolen = f"{lock}.stale-{uuid.uuid4().hex[:8]}"
                        os.rename(lock, stolen)
                        # re-check AFTER the rename: another waiter may have
                        # stolen the stale lock and recreated a FRESH one in
                        # the window between our stat and our rename — if the
                        # file we captured is fresh it is a live writer's
                        # lock, so put it back (best effort) and keep waiting
                        if time.time() - os.path.getmtime(stolen) > 60:
                            os.unlink(stolen)
                        else:
                            try:
                                os.rename(stolen, lock)
                            except OSError:
                                os.unlink(stolen)
                        continue
                except OSError:
                    continue
                if time.time() > deadline:
                    raise RegistryLockTimeout(
                        f"registration lock at {lock} held past "
                        f"{self.lock_timeout_s}s"
                    ) from None
                time.sleep(0.05)

    def _release_lock(self) -> None:
        try:
            os.unlink(os.path.join(self.data_path, ".lock"))
        except OSError:
            pass

    # -- registry contract -------------------------------------------------

    def register(self, schema_json: str, subject: str | None = None) -> int:
        """Id for the schema under ``subject``: the existing id when the
        subject already has this schema version, else the next free
        ``{id}.avsc`` slot, committed with the subject file updated —
        all under the lock."""
        subject = subject or self.default_subject
        canonical = _canonical(schema_json)
        self._acquire_lock()
        try:
            versions = self.versions(subject)
            for sid in versions:
                if self.schema(sid) == canonical:
                    return sid
            sid = 0
            while os.path.exists(self._schema_path(sid)):
                sid += 1
            tmp = self._schema_path(sid) + ".tmp"
            with open(tmp, "w") as f:
                f.write(json.dumps(json.loads(schema_json), indent=2))
            os.replace(tmp, self._schema_path(sid))
            dat = os.path.join(self.data_path, f"{subject}.dat")
            with open(dat + ".tmp", "w") as f:
                f.write(",".join(str(i) for i in [*versions, sid]))
            os.replace(dat + ".tmp", dat)
            self._cache[sid] = canonical
            return sid
        finally:
            self._release_lock()

    def schema(self, schema_id: int) -> str:
        got = self._cache.get(schema_id)
        if got is None:
            with open(self._schema_path(schema_id)) as f:
                got = _canonical(f.read())
            self._cache[schema_id] = got
        return got

    def ids(self) -> list[int]:
        out = []
        for name in os.listdir(self.data_path):
            if name.endswith(".avsc"):
                try:
                    out.append(int(name[: -len(".avsc")]))
                except ValueError:
                    continue
        return sorted(out)

    def subjects(self) -> list[str]:
        return sorted(
            name[: -len(".dat")]
            for name in os.listdir(self.data_path)
            if name.endswith(".dat")
        )

    def versions(self, subject: str) -> list[int]:
        """Subject's schema ids in registration (= version) order."""
        dat = os.path.join(self.data_path, f"{subject}.dat")
        if not os.path.exists(dat):
            return []
        with open(dat) as f:
            text = f.read().strip()
        return [int(x) for x in text.split(",")] if text else []

    def _schema_path(self, schema_id: int) -> str:
        return os.path.join(self.data_path, f"{schema_id}.avsc")
