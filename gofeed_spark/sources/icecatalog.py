"""Iceberg REST catalog: client + a directory-backed reference server.

Real Iceberg deployments resolve tables through a CATALOG, not a
filesystem path: the client asks the catalog for ``ns.table``, receives
the current table metadata, and COMMITS by sending an
``updates``/``requirements`` change set that the catalog validates and
applies atomically (the REST Catalog OpenAPI spec at
iceberg.apache.org/rest-catalog-spec — requirements are the optimistic-
concurrency predicate, the server is the arbiter).

This module implements both halves from the public spec:

- :class:`RestCatalog` — the CLIENT: config / namespaces / load /
  register / commit over plain ``urllib`` (Bearer token optional).
  :func:`read_iceberg_rest` reads through a catalog identifier;
  :func:`commit_iceberg_rest` runs ANY of this engine's write operations
  (append, overwrite, merge, rewrite, deletes) as a catalog commit: the
  write's metadata publication is intercepted (``capture_commit``), the
  old→new metadata delta is expressed as spec update operations
  (``add-snapshot``, ``set-snapshot-ref``, ``add-schema``,
  ``set-current-schema``), and the POST carries
  ``assert-ref-snapshot-id`` so a concurrent committer loses loudly
  (:class:`IcebergConcurrentWrite`), never silently.

- :class:`RestCatalogServer` — a minimal REFERENCE server backing the
  spec onto a warehouse directory (tables in HadoopCatalog layout, so
  the same tables stay readable path-wise): it validates requirements
  against the table's current metadata and publishes the next metadata
  version through the same create-if-absent arbitration the direct
  writers use.  It exists so the client is testable end-to-end and a
  local warehouse can be served to other engines; HadoopCatalog
  (path-addressed) remains the default access mode.

Identifiers are ``ns.table`` (one namespace level, the common case;
multi-level namespaces use the spec's ``%1F`` unit separator — out of
scope here and refused loudly).
"""

from __future__ import annotations

import json
import posixpath
import threading
import urllib.error
import urllib.parse
import urllib.request
from contextlib import contextmanager

from gofeed_spark.fs import get_filesystem
from gofeed_spark.sources import iceberg as ice
from gofeed_spark.sources.iceberg import (
    IcebergConcurrentWrite,
    IcebergError,
    _list_meta_versions,
    _load_metadata,
    _meta_dir,
    _meta_name,
)


class NoSuchTable(IcebergError):
    pass


# --- commit capture (writer proposes, catalog publishes) --------------------


@contextmanager
def capture_commit():
    """Intercept the next metadata publication inside this block: the
    write op builds its new metadata as usual, but instead of writing
    ``vN+1.metadata.json`` the dict lands in the returned holder —
    ``holder['meta']`` / ``holder['path']`` after the write returns.
    Not re-entrant (module-global hook; catalog commits are sequential
    by nature)."""
    holder: dict = {}

    def intercept(fs, path, version, new_meta):
        holder["meta"] = new_meta
        holder["path"] = path
        holder["version"] = version
        return True

    if ice._PUBLISH_INTERCEPT is not None:
        raise IcebergError("capture_commit is not re-entrant")
    ice._PUBLISH_INTERCEPT = intercept
    try:
        yield holder
    finally:
        ice._PUBLISH_INTERCEPT = None


# --- metadata delta → spec update operations --------------------------------


def _updates_between(old: dict, new: dict) -> list[dict]:
    """The spec update operations that transform ``old`` table metadata
    into ``new`` — the commit body our writers' outputs need (schema
    evolution, then snapshots, then the ref move, mirroring apply
    order)."""
    ups: list[dict] = []
    if new.get("format-version", 2) != old.get("format-version", 2):
        ups.append(
            {
                "action": "upgrade-format-version",
                "format-version": new.get("format-version", 2),
            }
        )
    old_sids = {s.get("schema-id", 0) for s in old.get("schemas") or []}
    for s in new.get("schemas") or []:
        if s.get("schema-id", 0) not in old_sids:
            ups.append({"action": "add-schema", "schema": s})
    if new.get("current-schema-id", 0) != old.get("current-schema-id", 0):
        ups.append(
            {
                "action": "set-current-schema",
                "schema-id": new.get("current-schema-id", 0),
            }
        )
    old_specs = {s.get("spec-id", 0) for s in old.get("partition-specs") or []}
    for s in new.get("partition-specs") or []:
        if s.get("spec-id", 0) not in old_specs:
            ups.append({"action": "add-spec", "spec": s})
    if new.get("default-spec-id", 0) != old.get("default-spec-id", 0):
        ups.append(
            {
                "action": "set-default-spec",
                "spec-id": new.get("default-spec-id", 0),
            }
        )
    old_snaps = {s["snapshot-id"] for s in old.get("snapshots") or []}
    for s in new.get("snapshots") or []:
        if s["snapshot-id"] not in old_snaps:
            ups.append({"action": "add-snapshot", "snapshot": s})
    if new.get("current-snapshot-id") != old.get("current-snapshot-id"):
        ups.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "type": "branch",
                "snapshot-id": new.get("current-snapshot-id"),
            }
        )
    old_refs = old.get("refs") or {}
    new_refs = new.get("refs") or {}
    for nm in sorted(new_refs):
        if nm != "main" and old_refs.get(nm) != new_refs[nm]:
            ups.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": nm,
                    "type": new_refs[nm].get("type", "branch"),
                    "snapshot-id": new_refs[nm]["snapshot-id"],
                }
            )
    for nm in sorted(old_refs):
        if nm != "main" and nm not in new_refs:
            ups.append({"action": "remove-snapshot-ref", "ref-name": nm})
    if new.get("next-row-id") is not None and new.get("next-row-id") != old.get(
        "next-row-id"
    ):
        # v3 row lineage: the id high-water mark must ride the commit or
        # the next catalog append would re-assign the same row ids
        ups.append(
            {"action": "set-next-row-id", "next-row-id": new["next-row-id"]}
        )
    return ups


def _apply_updates(meta: dict, updates: list[dict]) -> dict:
    """Server-side application of the supported update operations; raises
    :class:`IcebergError` for unsupported actions (a spec server returns
    400 for those)."""
    out = dict(meta)
    for u in updates:
        act = u.get("action")
        if act == "add-schema":
            s = u["schema"]
            out["schemas"] = list(out.get("schemas") or []) + [s]
            top = max(
                (f.get("id", 0) for f in s.get("fields", [])),
                default=0,
            )
            out["last-column-id"] = max(int(out.get("last-column-id", 0)), top)
        elif act == "add-spec":
            s = u["spec"]
            out["partition-specs"] = list(
                out.get("partition-specs") or []
            ) + [s]
            top = max(
                (f.get("field-id", 0) for f in s.get("fields") or []),
                default=0,
            )
            out["last-partition-id"] = max(
                int(out.get("last-partition-id", 999)), top
            )
        elif act == "set-default-spec":
            sid = u["spec-id"]
            if sid == -1:  # spec: -1 = the spec added in this commit
                sid = (out.get("partition-specs") or [{}])[-1].get(
                    "spec-id", 0
                )
            out["default-spec-id"] = sid
        elif act == "set-current-schema":
            sid = u["schema-id"]
            if sid == -1:  # spec: -1 = the schema added in this commit
                sid = (out.get("schemas") or [{}])[-1].get("schema-id", 0)
            out["current-schema-id"] = sid
        elif act == "add-snapshot":
            s = u["snapshot"]
            out["snapshots"] = list(out.get("snapshots") or []) + [s]
            out["last-sequence-number"] = max(
                int(out.get("last-sequence-number", 0)),
                int(s.get("sequence-number", 0)),
            )
            out["last-updated-ms"] = s.get(
                "timestamp-ms", out.get("last-updated-ms", 0)
            )
        elif act == "set-snapshot-ref":
            nm = u.get("ref-name", "main")
            sid = u["snapshot-id"]
            refs = dict(out.get("refs") or {})
            refs[nm] = {
                "snapshot-id": sid,
                "type": u.get("type", "branch"),
            }
            out["refs"] = refs
            if nm == "main":
                out["current-snapshot-id"] = sid
                ts = next(
                    (
                        s.get("timestamp-ms", 0)
                        for s in out.get("snapshots") or []
                        if s["snapshot-id"] == sid
                    ),
                    0,
                )
                out["snapshot-log"] = list(out.get("snapshot-log") or []) + [
                    {"timestamp-ms": ts, "snapshot-id": sid}
                ]
        elif act == "remove-snapshot-ref":
            nm = u.get("ref-name")
            if nm == "main":
                raise IcebergError("cannot remove the main branch")
            refs = dict(out.get("refs") or {})
            refs.pop(nm, None)
            out["refs"] = refs
        elif act == "set-properties":
            props = dict(out.get("properties") or {})
            props.update(u.get("updates") or {})
            out["properties"] = props
        elif act == "remove-properties":
            props = dict(out.get("properties") or {})
            for k in u.get("removals") or []:
                props.pop(k, None)
            out["properties"] = props
        elif act == "upgrade-format-version":
            want = int(u.get("format-version", 0))
            have = int(out.get("format-version", 2))
            if want < have:
                raise IcebergError(
                    f"format-version can only upgrade ({have} -> {want})"
                )
            out["format-version"] = want
        elif act == "set-next-row-id":
            want = int(u.get("next-row-id", 0))
            have = int(out.get("next-row-id", 0) or 0)
            if want < have:
                # ids are never reused; a stale writer must lose here
                raise IcebergError(
                    f"next-row-id must be monotone ({have} -> {want})"
                )
            out["next-row-id"] = want
        else:
            raise IcebergError(f"unsupported update action {act!r}")
    return out


def _check_requirements(meta: dict | None, requirements: list[dict]) -> None:
    """Raise :class:`IcebergConcurrentWrite` when a requirement fails —
    the optimistic-concurrency half of the commit protocol."""
    for r in requirements:
        typ = r.get("type")
        if typ == "assert-create":
            if meta is not None:
                raise IcebergConcurrentWrite("table already exists")
        elif typ == "assert-table-uuid":
            if meta is None or meta.get("table-uuid") != r.get("uuid"):
                raise IcebergConcurrentWrite(
                    f"table uuid changed (want {r.get('uuid')})"
                )
        elif typ == "assert-ref-snapshot-id":
            if r.get("ref", "main") != "main":
                raise IcebergError("only the main branch is supported")
            current = meta.get("current-snapshot-id") if meta else None
            if current != r.get("snapshot-id"):
                raise IcebergConcurrentWrite(
                    f"ref main moved: at {current}, "
                    f"commit expects {r.get('snapshot-id')}"
                )
        else:
            raise IcebergError(f"unsupported requirement type {typ!r}")


# --- client ------------------------------------------------------------------


class RestCatalog:
    """Minimal REST catalog client (spec subset: config, namespaces,
    load/register/commit table).  ``ident`` everywhere is ``ns.table``."""

    def __init__(self, uri: str, token: str | None = None, prefix: str = ""):
        self.base = uri.rstrip("/")
        self.token = token
        self.prefix = prefix
        cfg = self._req("GET", "/v1/config")
        self.prefix = (cfg.get("overrides") or {}).get("prefix", prefix)

    # -- plumbing --
    def _url(self, path: str) -> str:
        pre = f"/{self.prefix}" if self.prefix else ""
        return f"{self.base}/v1{pre}{path}" if not path.startswith("/v1") else (
            f"{self.base}{path}"
        )

    def _req(self, method: str, path: str, body: dict | None = None) -> dict:
        url = self._url(path)
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                return json.loads(raw) if raw else {}
        except urllib.error.HTTPError as exc:
            detail = exc.read().decode("utf-8", "replace")
            if exc.code == 404:
                raise NoSuchTable(f"{method} {path}: {detail}") from exc
            if exc.code == 409:
                raise IcebergConcurrentWrite(detail) from exc
            raise IcebergError(f"{method} {path}: HTTP {exc.code} {detail}") from exc

    @staticmethod
    def _split(ident: str) -> tuple[str, str]:
        if ident.count(".") != 1:
            raise IcebergError(
                f"identifier must be ns.table, got {ident!r} "
                "(multi-level namespaces are unsupported)"
            )
        ns, tbl = ident.split(".")
        return urllib.parse.quote(ns, safe=""), urllib.parse.quote(tbl, safe="")

    # -- surface --
    def list_namespaces(self) -> list[str]:
        out = self._req("GET", "/namespaces")
        return [".".join(n) for n in out.get("namespaces", [])]

    def create_namespace(self, ns: str) -> None:
        self._req("POST", "/namespaces", {"namespace": [ns]})

    def list_tables(self, ns: str) -> list[str]:
        nsq = urllib.parse.quote(ns, safe="")
        out = self._req("GET", f"/namespaces/{nsq}/tables")
        return [
            f"{ns}.{t['name']}" for t in out.get("identifiers", [])
        ]

    def table_exists(self, ident: str) -> bool:
        try:
            self.load_table(ident)
            return True
        except NoSuchTable:
            return False

    def load_table(self, ident: str) -> dict:
        """{"metadata-location": ..., "metadata": {...}}"""
        ns, tbl = self._split(ident)
        return self._req("GET", f"/namespaces/{ns}/tables/{tbl}")

    def register_table(self, ident: str, metadata_location: str) -> dict:
        ns, tbl = self._split(ident)
        name = urllib.parse.unquote(tbl)
        return self._req(
            "POST",
            f"/namespaces/{ns}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def commit_table(
        self, ident: str, requirements: list[dict], updates: list[dict]
    ) -> dict:
        ns, tbl = self._split(ident)
        return self._req(
            "POST",
            f"/namespaces/{ns}/tables/{tbl}",
            {"requirements": requirements, "updates": updates},
        )


# --- catalog-mediated read/write --------------------------------------------


def read_iceberg_rest(spark, catalog: RestCatalog, ident: str, **kw):
    """Read ``ns.table`` through the catalog: one load RPC resolves the
    metadata (no version-hint I/O), the data plane is the normal
    manifest-pruned read."""
    t = catalog.load_table(ident)
    meta = t["metadata"]
    return ice.read_iceberg(
        spark, meta["location"], metadata=meta, **kw
    )


def commit_iceberg_rest(catalog: RestCatalog, ident: str, write_fn):
    """Run ``write_fn(location)`` — any of this engine's Iceberg write
    operations pointed at the table's location — as ONE catalog commit.

    Existing table: the catalog's metadata is synced down to the local
    metadata dir (so the writer builds on the CATALOG's state, not a
    stale or rejected local one), the writer's publication is captured,
    and the delta goes up as updates guarded by ``assert-ref-snapshot-id``
    on the loaded state; the catalog is the arbiter.  Returns the
    catalog's load result after the commit."""
    t = catalog.load_table(ident)
    meta, loc = t["metadata"], t["metadata"]["location"]
    _sync_local(loc, t["metadata-location"], meta)
    with capture_commit() as cap:
        write_fn(loc)
    if "meta" not in cap:
        return t  # the operation no-oped: nothing to commit
    requirements = [
        {
            "type": "assert-ref-snapshot-id",
            "ref": "main",
            "snapshot-id": meta.get("current-snapshot-id"),
        }
    ]
    if meta.get("table-uuid"):
        requirements.insert(
            0, {"type": "assert-table-uuid", "uuid": meta["table-uuid"]}
        )
    updates = _updates_between(meta, cap["meta"])
    catalog.commit_table(ident, requirements, updates)
    return catalog.load_table(ident)


def create_iceberg_rest(
    catalog: RestCatalog, ident: str, location: str, write_fn
) -> dict:
    """Create ``ns.table`` through the catalog: the first write commits
    locally (nothing to arbitrate yet — the table does not exist), then
    the metadata location REGISTERS (the spec's register endpoint for
    existing metadata).  Returns the catalog's load result."""
    if catalog.table_exists(ident):
        raise IcebergError(f"{ident} already exists in the catalog")
    write_fn(location)
    fs = get_filesystem(location)
    _meta, version = _load_metadata(fs, location)
    mloc = posixpath.join(_meta_dir(location), _meta_name(version))
    return catalog.register_table(ident, mloc)


def _sync_local(location: str, metadata_location: str, metadata: dict) -> None:
    """Make the local HadoopCatalog layout reflect the CATALOG's current
    metadata: point the version hint at the catalog's metadata file when
    it lives in the table dir (the directory-backed server), or land the
    metadata as the next local version otherwise (a remote catalog) —
    either way the next writer builds on catalog state, and a previously
    REJECTED local commit (orphan vN+1 + stale hint) is stepped past."""
    fs = get_filesystem(location)
    md = _meta_dir(location)
    base = metadata_location.rsplit("/", 1)[-1]
    if fs.exists(fs.join(md, base)):
        local = json.loads(fs.read_bytes(fs.join(md, base)))
        if local.get("current-snapshot-id") == metadata.get(
            "current-snapshot-id"
        ):
            ver = base.split(".", 1)[0].lstrip("v")
            if ver.isdigit():
                fs.put_bytes(
                    fs.join(md, "version-hint.text"), ver.encode()
                )
            return
    versions = _list_meta_versions(fs, md) if fs.exists(md) else []
    nxt = (versions[-1][0] + 1) if versions else 1
    fs.put_bytes(
        fs.join(md, _meta_name(nxt)),
        json.dumps(metadata, indent=1).encode("utf-8"),
    )
    fs.put_bytes(fs.join(md, "version-hint.text"), str(nxt).encode())


# --- reference server ---------------------------------------------------------


class RestCatalogServer:
    """Directory-backed REST catalog server (reference implementation of
    the spec subset the client uses).  Tables live at
    ``{warehouse}/{ns}/{table}`` in HadoopCatalog layout; the registry
    (``_catalog.json`` at the warehouse root) maps identifiers to
    locations; commits validate requirements against current metadata
    and publish the next version through the same create-if-absent
    arbitration direct writers use — so the server and any direct
    writer can never both win the same version."""

    def __init__(self, warehouse: str, host: str = "127.0.0.1", port: int = 0):
        import http.server

        self.warehouse = warehouse.rstrip("/")
        self.fs = get_filesystem(self.warehouse)
        self._lock = threading.Lock()
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: dict | None = None):
                raw = json.dumps(body or {}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n)) if n else {}

            def do_GET(self):
                try:
                    outer._get(self)
                except Exception as exc:  # noqa: BLE001
                    self._send(500, {"error": {"message": str(exc)}})

            def do_POST(self):
                try:
                    outer._post(self)
                except IcebergConcurrentWrite as exc:
                    self._send(409, {"error": {"message": str(exc)}})
                except NoSuchTable as exc:
                    self._send(404, {"error": {"message": str(exc)}})
                except IcebergError as exc:
                    self._send(400, {"error": {"message": str(exc)}})
                except Exception as exc:  # noqa: BLE001
                    self._send(500, {"error": {"message": str(exc)}})

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self.uri = f"http://{host}:{self.port}"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    # -- lifecycle --
    def start(self) -> "RestCatalogServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- registry --
    def _registry(self) -> dict:
        p = self.fs.join(self.warehouse, "_catalog.json")
        if not self.fs.exists(p):
            return {"namespaces": [], "tables": {}}
        return json.loads(self.fs.read_bytes(p))

    def _put_registry(self, reg: dict) -> None:
        self.fs.put_bytes(
            self.fs.join(self.warehouse, "_catalog.json"),
            json.dumps(reg, indent=1).encode(),
        )

    def _table_meta(self, loc: str) -> tuple[dict, int]:
        return _load_metadata(self.fs, loc)

    # -- routing --
    def _get(self, h) -> None:
        parts = [p for p in h.path.split("/") if p]
        if parts == ["v1", "config"]:
            h._send(200, {"defaults": {}, "overrides": {}})
            return
        if parts == ["v1", "namespaces"]:
            reg = self._registry()
            h._send(200, {"namespaces": [[n] for n in reg["namespaces"]]})
            return
        if len(parts) == 4 and parts[:2] == ["v1", "namespaces"] and parts[3] == "tables":
            ns = urllib.parse.unquote(parts[2])
            reg = self._registry()
            idents = [
                {"namespace": [ns], "name": i.split(".", 1)[1]}
                for i in reg["tables"]
                if i.split(".", 1)[0] == ns
            ]
            h._send(200, {"identifiers": idents})
            return
        if len(parts) == 5 and parts[:2] == ["v1", "namespaces"] and parts[3] == "tables":
            ident = f"{urllib.parse.unquote(parts[2])}.{urllib.parse.unquote(parts[4])}"
            reg = self._registry()
            if ident not in reg["tables"]:
                h._send(404, {"error": {"message": f"no such table {ident}"}})
                return
            loc = reg["tables"][ident]
            meta, version = self._table_meta(loc)
            h._send(
                200,
                {
                    "metadata-location": posixpath.join(
                        _meta_dir(loc), _meta_name(version)
                    ),
                    "metadata": meta,
                },
            )
            return
        h._send(404, {"error": {"message": f"no route {h.path}"}})

    def _post(self, h) -> None:
        parts = [p for p in h.path.split("/") if p]
        body = h._body()
        with self._lock:
            if parts == ["v1", "namespaces"]:
                ns = body["namespace"]
                if len(ns) != 1:
                    raise IcebergError("multi-level namespaces unsupported")
                reg = self._registry()
                if ns[0] not in reg["namespaces"]:
                    reg["namespaces"].append(ns[0])
                    self._put_registry(reg)
                h._send(200, {"namespace": ns})
                return
            if (
                len(parts) == 4
                and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "register"
            ):
                ns = urllib.parse.unquote(parts[2])
                ident = f"{ns}.{body['name']}"
                mloc = body["metadata-location"]
                meta = json.loads(self.fs.read_bytes(mloc))
                reg = self._registry()
                if ident in reg["tables"]:
                    raise IcebergConcurrentWrite(f"{ident} already registered")
                if ns not in reg["namespaces"]:
                    reg["namespaces"].append(ns)
                # location from the metadata itself (register trusts the
                # existing metadata file, per the spec)
                reg["tables"][ident] = meta["location"]
                self._put_registry(reg)
                h._send(200, {"metadata-location": mloc, "metadata": meta})
                return
            if (
                len(parts) == 5
                and parts[:2] == ["v1", "namespaces"]
                and parts[3] == "tables"
            ):
                ident = (
                    f"{urllib.parse.unquote(parts[2])}."
                    f"{urllib.parse.unquote(parts[4])}"
                )
                reg = self._registry()
                if ident not in reg["tables"]:
                    raise NoSuchTable(f"no such table {ident}")
                loc = reg["tables"][ident]
                meta, version = self._table_meta(loc)
                _check_requirements(meta, body.get("requirements") or [])
                new_meta = _apply_updates(meta, body.get("updates") or [])
                ice._publish_metadata(self.fs, loc, version, new_meta)
                h._send(
                    200,
                    {
                        "metadata-location": posixpath.join(
                            _meta_dir(loc), _meta_name(version + 1)
                        ),
                        "metadata": new_meta,
                    },
                )
                return
        h._send(404, {"error": {"message": f"no route {h.path}"}})
