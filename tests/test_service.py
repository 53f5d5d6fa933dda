"""HTTP facade tests: drive the service surface over a real socket,
mirroring the reference's REST-era suite
(``/root/reference/tests/test_views.py``)."""

from __future__ import annotations

import base64
import http.client
import json

import pytest

from moisturizer_spark.crud import Engine
from moisturizer_spark.service import serve_background


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    engine = Engine(spark, str(tmp_path_factory.mktemp("http_wh")))
    server = serve_background(engine)
    admin_key = engine.get_user("admin")["api_key"]
    yield server.server_address, engine, admin_key
    server.shutdown()


def call(addr, method, path, body=None, auth=None):
    conn = http.client.HTTPConnection(*addr, timeout=60)
    headers = {"Content-Type": "application/json"}
    if auth:
        headers["Authorization"] = "Basic " + base64.b64encode(
            f"{auth[0]}:{auth[1]}".encode()
        ).decode()
    conn.request(method, path, json.dumps(body) if body is not None else None, headers)
    resp = conn.getresponse()
    data = json.loads(resp.read() or b"null")
    conn.close()
    return resp.status, data


def test_heartbeat_requires_auth(service):
    addr, _, admin_key = service
    status, _ = call(addr, "GET", "/__heartbeat__")
    assert status == 403
    status, data = call(addr, "GET", "/__heartbeat__", auth=("admin", admin_key))
    assert status == 200
    assert data == {"server": True, "schema": True, "users": True}


def test_bad_credentials_403(service):
    addr, _, _ = service
    status, _ = call(addr, "GET", "/__heartbeat__", auth=("admin", "wrong-key"))
    assert status == 403


def test_object_crud_over_http(service):
    addr, _, admin_key = service
    admin = ("admin", admin_key)

    # create (POST) with schema inference
    status, created = call(
        addr, "POST", "/types/my_type/objects", {"foo": "bar", "number": 42}, admin
    )
    assert status == 200 and created["foo"] == "bar"
    oid = created["id"]

    # point read
    status, got = call(addr, "GET", f"/types/my_type/objects/{oid}", auth=admin)
    assert status == 200 and got["number"] == 42

    # PUT replaces at the URL id; unprovided fields null out
    status, put = call(
        addr, "PUT", "/types/my_type/objects/42", {"number": 7}, admin
    )
    assert status == 200 and put["id"] == "42" and "foo" not in put

    # PATCH merges
    status, patched = call(
        addr, "PATCH", "/types/my_type/objects/42", {"foo": "baz"}, admin
    )
    assert status == 200 and patched["foo"] == "baz" and patched["number"] == 7

    # validation failure → 400 (foo was inferred string)
    status, err = call(
        addr, "POST", "/types/my_type/objects", {"foo": 12, "number": 1}, admin
    )
    assert status == 400 and "error" in err

    # list + delete echo
    status, listed = call(addr, "GET", "/types/my_type/objects", auth=admin)
    assert status == 200 and {r["id"] for r in listed} == {oid, "42"}
    status, deleted = call(addr, "DELETE", "/types/my_type/objects/42", auth=admin)
    assert status == 200 and deleted["id"] == "42"
    status, _ = call(addr, "GET", "/types/my_type/objects/42", auth=admin)
    assert status == 404

    # delete collection echoes remaining rows
    status, gone = call(addr, "DELETE", "/types/my_type/objects", auth=admin)
    assert status == 200 and [r["id"] for r in gone] == [oid]


def test_unknown_type_is_403(service):
    addr, _, admin_key = service
    status, _ = call(
        addr, "GET", "/types/never_created/objects", auth=("admin", admin_key)
    )
    assert status == 403


def test_type_ddl_over_http(service):
    addr, _, admin_key = service
    admin = ("admin", admin_key)
    payload = {
        "id": "declared",
        "description": "My precious type.",
        "properties": {"foo": {"type": "string"}},
    }
    status, created = call(addr, "POST", "/types", payload, admin)
    assert status == 200 and created["id"] == "declared"
    status, listed = call(addr, "GET", "/types", auth=admin)
    assert status == 200 and "declared" in {t["id"] for t in listed}

    # PUT /types/{t}: migrate foo → integer
    status, migrated = call(
        addr, "PUT", "/types/declared",
        {"properties": {"foo": {"type": "integer"}}}, admin,
    )
    assert status == 200
    status, got = call(addr, "GET", "/types/declared", auth=admin)
    assert status == 200

    status, _ = call(addr, "DELETE", "/types/declared", auth=admin)
    assert status == 200


def test_user_permission_matrix_over_http(service):
    addr, _, admin_key = service
    admin = ("admin", admin_key)

    status, user = call(
        addr, "POST", "/users",
        {"id": "my_user", "role": "user", "password": "my_secret"}, admin,
    )
    assert status == 200
    assert "password" not in user  # never echoed
    key = user["api_key"]
    creds = ("my_user", key)

    # a type with data, owned by admin
    call(addr, "POST", "/types/gated/objects", {"v": 1}, admin)

    # no grant → 403 on read
    status, _ = call(addr, "GET", "/types/gated/objects", auth=creds)
    assert status == 403

    # read-only grant (reference payload shape: {'read': True, 'id': type})
    status, _ = call(
        addr, "POST", "/users/my_user/permissions", {"read": True, "id": "gated"}, admin
    )
    assert status == 200
    status, rows = call(addr, "GET", "/types/gated/objects", auth=creds)
    assert status == 200 and len(rows) == 1
    # ...but still no create
    status, _ = call(addr, "POST", "/types/gated/objects", {"v": 2}, auth=creds)
    assert status == 403

    # non-admin cannot touch admin surfaces
    status, _ = call(addr, "GET", "/users", auth=creds)
    assert status == 403
    status, _ = call(addr, "POST", "/types", {"id": "x"}, auth=creds)
    assert status == 403

    status, _ = call(addr, "DELETE", "/users/my_user", auth=admin)
    assert status == 200


def test_malformed_json_is_400(service):
    addr, _, admin_key = service
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request(
        "POST", "/types/my_type/objects", "{not json",
        {
            "Content-Type": "application/json",
            "Authorization": "Basic "
            + base64.b64encode(f"admin:{admin_key}".encode()).decode(),
        },
    )
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_unknown_route_404(service):
    addr, _, admin_key = service
    status, _ = call(addr, "GET", "/nope", auth=("admin", admin_key))
    assert status == 404
