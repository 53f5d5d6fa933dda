"""HTTP facade over the CRUD engine: the reference's service surface.

The reference ships a Pyramid app served with ``pserve``
(``/root/reference/setup.py:48-52``, ``README.rst:38``); its views code is
absent at HEAD, so the REST-era tests are the spec
(``/root/reference/tests/test_views.py:10-20`` URL templates, basic-auth
``:33-47``). This module re-creates that surface with the standard
library only (``http.server``) — the engine itself stays a Spark driver
program; HTTP is a thin, dependency-free shell around
:class:`moisturizer_spark.crud.Engine`.

Routes (all JSON in/out, HTTP basic auth = ``user_id:api_key``):

====== ====================================== ==============================
Method Path                                   Engine call
====== ====================================== ==============================
GET    /__heartbeat__                         heartbeat()
GET    /types                                 list_types()
POST   /types                                 create_type(body)
GET    /types/{t}                             get_type(t)
PUT    /types/{t}                             migrate_type(t, body)
DELETE /types/{t}                             delete_type(t)
GET    /types/{t}/objects                     list_objects(t)
GET    /types/{t}/changes?from=N[&to=M]       object_changes(t, N, M)
POST   /types/{t}/objects                     create_object(t, body)
DELETE /types/{t}/objects                     delete_collection(t)
GET    /types/{t}/objects/{id}                get_object(t, id)
PUT    /types/{t}/objects/{id}                upsert_object(t, id, body)
PATCH  /types/{t}/objects/{id}                patch_object(t, id, body)
DELETE /types/{t}/objects/{id}                delete_object(t, id)
GET    /users                                 list_users()
POST   /users                                 create_user(body)
GET    /users/{u}                             get_user(u)
DELETE /users/{u}                             delete_user(u)
POST   /users/{u}/permissions                 grant(u, body[id], flags)
====== ====================================== ==============================

Error mapping: the typed errors' ``status`` attribute becomes the HTTP
status (400 validation, 403 permission/unknown type, 404 missing object —
:mod:`moisturizer_spark.errors`), matching the codes the reference tests
assert.

Scale note: the facade is a control-plane surface (point reads/writes,
DDL). Point ops prune to one storage bucket via
:meth:`~moisturizer_spark.storage.ParquetTable.lookup`/``delete_by_key``;
bulk analytics never flow through HTTP — they run as Spark jobs against
the same warehouse.
"""

from __future__ import annotations

import base64
import binascii
import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from moisturizer_spark.crud import ADMIN_USER, Engine
from moisturizer_spark.errors import MoisturizerError, PermissionDenied, ValidationError

_ROUTES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^/__heartbeat__$"), "heartbeat"),
    (re.compile(r"^/types$"), "types"),
    (re.compile(r"^/types/(?P<type_id>[^/]+)$"), "type"),
    (re.compile(r"^/types/(?P<type_id>[^/]+)/objects$"), "objects"),
    (re.compile(r"^/types/(?P<type_id>[^/]+)/changes$"), "changes"),
    (re.compile(r"^/types/(?P<type_id>[^/]+)/objects/(?P<object_id>[^/]+)$"), "object"),
    (re.compile(r"^/users$"), "users"),
    (re.compile(r"^/users/(?P<user_id>[^/]+)$"), "user"),
    (re.compile(r"^/users/(?P<user_id>[^/]+)/permissions$"), "permissions"),
]


class _Handler(BaseHTTPRequestHandler):
    # set by make_server on the subclass
    engine: Engine = None  # type: ignore[assignment]

    protocol_version = "HTTP/1.1"

    # -- plumbing -----------------------------------------------------------
    def log_message(self, fmt, *args):  # quiet by default; hook if needed
        pass

    def _json_body(self) -> dict:
        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length) if length else b""
        if not raw:
            return {}
        try:
            body = json.loads(raw)
        except json.JSONDecodeError as exc:
            raise ValidationError(f"request body is not valid JSON: {exc}") from None
        if not isinstance(body, dict):
            raise ValidationError("request body must be a JSON object")
        return body

    def _reply(self, status: int, payload) -> None:
        data = json.dumps(payload, default=str).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _caller(self) -> str:
        """Resolve basic auth to a user id; 403 on absent/bad credentials
        (every route requires auth, reference ``test_views.py:33-38``)."""
        header = self.headers.get("Authorization") or ""
        if not header.startswith("Basic "):
            raise PermissionDenied("missing basic auth")
        try:
            decoded = base64.b64decode(header[len("Basic "):]).decode()
            user_id, _, api_key = decoded.partition(":")
        except (binascii.Error, UnicodeDecodeError):
            raise PermissionDenied("malformed basic auth") from None
        return self.engine.authenticate(user_id, api_key)["id"]

    # -- dispatch -----------------------------------------------------------
    def _handle(self, method: str) -> None:
        try:
            path, _, query = self.path.partition("?")
            self._query = dict(urllib.parse.parse_qsl(query))
            for pattern, name in _ROUTES:
                m = pattern.match(path)
                if m:
                    caller = self._caller()
                    fn = getattr(self, f"_{name}_{method}", None)
                    if fn is None:
                        self._reply(405, {"error": f"{method} not allowed on {self.path}"})
                        return
                    self._reply(200, fn(caller, **m.groupdict()))
                    return
            self._reply(404, {"error": f"no route for {path}"})
        except MoisturizerError as exc:
            self._reply(exc.status, {"error": str(exc) or type(exc).__name__})
        except Exception as exc:  # pragma: no cover - last-resort 500
            self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

    def do_GET(self):
        self._handle("GET")

    def do_POST(self):
        self._handle("POST")

    def do_PUT(self):
        self._handle("PUT")

    def do_PATCH(self):
        self._handle("PATCH")

    def do_DELETE(self):
        self._handle("DELETE")

    # -- route implementations ---------------------------------------------
    def _heartbeat_GET(self, caller):
        return self.engine.heartbeat()

    def _types_GET(self, caller):
        self._admin_only(caller)
        return self.engine.list_types()

    def _types_POST(self, caller):
        self._admin_only(caller)
        body = self._json_body()
        return self.engine.create_type(
            body.get("id") or "", body.get("properties"), body.get("description")
        )

    def _type_GET(self, caller, type_id):
        self._admin_only(caller)
        return self.engine.get_type(type_id)

    def _type_PUT(self, caller, type_id):
        self._admin_only(caller)
        body = self._json_body()
        return self.engine.migrate_type(
            type_id, body.get("properties") or {}, body.get("description")
        )

    def _type_DELETE(self, caller, type_id):
        self._admin_only(caller)
        return self.engine.delete_type(type_id)

    def _objects_GET(self, caller, type_id):
        return self.engine.list_objects(type_id, user=caller)

    def _objects_POST(self, caller, type_id):
        return self.engine.create_object(type_id, self._json_body(), user=caller)

    def _objects_DELETE(self, caller, type_id):
        return self.engine.delete_collection(type_id, user=caller)

    def _changes_GET(self, caller, type_id):
        try:
            from_version = int(self._query.get("from", ""))
        except ValueError:
            raise ValidationError("changes requires an integer ?from=N") from None
        to_raw = self._query.get("to")
        try:
            to_version = int(to_raw) if to_raw is not None else None
        except ValueError:
            raise ValidationError("?to must be an integer") from None
        return self.engine.object_changes(
            type_id, from_version, to_version, user=caller
        )

    def _object_GET(self, caller, type_id, object_id):
        return self.engine.get_object(type_id, object_id, user=caller)

    def _object_PUT(self, caller, type_id, object_id):
        return self.engine.upsert_object(type_id, object_id, self._json_body(), user=caller)

    def _object_PATCH(self, caller, type_id, object_id):
        return self.engine.patch_object(type_id, object_id, self._json_body(), user=caller)

    def _object_DELETE(self, caller, type_id, object_id):
        return self.engine.delete_object(type_id, object_id, user=caller)

    def _users_GET(self, caller):
        self._admin_only(caller)
        return self.engine.list_users()

    def _users_POST(self, caller):
        self._admin_only(caller)
        body = self._json_body()
        return self.engine.create_user(
            body.get("id") or "", body.get("password"), body.get("role", "user")
        )

    def _user_GET(self, caller, user_id):
        if caller != user_id:
            self._admin_only(caller)
        return self.engine.get_user(user_id)

    def _user_DELETE(self, caller, user_id):
        self._admin_only(caller)
        return self.engine.delete_user(user_id)

    def _permissions_POST(self, caller, user_id):
        self._admin_only(caller)
        body = self._json_body()
        type_id = body.get("id") or body.get("type_id") or ""
        return self.engine.grant(
            user_id,
            type_id,
            read=bool(body.get("read", False)),
            create=bool(body.get("create", False)),
            write=bool(body.get("write", False)),
        )

    def _admin_only(self, caller: str) -> None:
        if caller != ADMIN_USER:
            raise PermissionDenied("admin only")


def make_server(engine: Engine, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``port=0`` picks a free port
    (``server.server_address[1]`` has the bound port)."""
    handler = type("BoundHandler", (_Handler,), {"engine": engine})
    return ThreadingHTTPServer((host, port), handler)


def serve_background(engine: Engine, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Start the facade on a daemon thread; returns the server (call
    ``.shutdown()`` to stop). Spark job submission is thread-safe, so
    concurrent requests each run their point ops on the shared session."""
    server = make_server(engine, host, port)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv: list[str] | None = None) -> None:  # pragma: no cover
    """``python -m moisturizer_spark.service [--host H] [--port P] [--warehouse DIR]``
    — the ``pserve`` analog (reference ``setup.py:48-52``,
    ``moisturizer/__main__.py``): boot a session, bind the facade, serve
    until interrupted."""
    import argparse

    from moisturizer_spark.session import get_spark

    parser = argparse.ArgumentParser(description="moisturizer_spark HTTP facade")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6543)  # pserve default port
    parser.add_argument("--warehouse", default="./warehouse")
    args = parser.parse_args(argv)

    spark = get_spark(app_name="moisturizer_spark_service")
    engine = Engine(spark, args.warehouse)
    server = make_server(engine, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(warehouse {args.warehouse})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()
