from __future__ import annotations

import asyncio
import random

import pytest

from distributed_api_etl_spark.request_execution.executor import RequestExecutor
from distributed_api_etl_spark.request_execution.middleware.interceptors import (
    JsonResponseMiddleware,
    RetryMiddleware,
)
from distributed_api_etl_spark.request_execution.middleware.injectors import (
    BasicAuthMiddleware,
    ParamInjectorMiddleware,
)
from distributed_api_etl_spark.request_execution.middleware.pipeline import (
    MiddlewarePipeline,
)
from distributed_api_etl_spark.request_execution.models import (
    RequestContext,
    RequestExchange,
    TransportResponse,
)
from distributed_api_etl_spark.request_execution.transport.mock import MockEngine


def run(coro):
    return asyncio.run(coro)


def make_exchange(row=None, request_id="r1"):
    return RequestExchange(
        context=RequestContext(
            method="GET", url="http://x/api", row=row or {}, request_id=request_id
        )
    )


def test_param_injector_with_transform():
    mw = ParamInjectorMiddleware([("pid", "patient_id", "upper"), ("q", "query", None)])

    async def next_call(ex):
        return ex

    ex = make_exchange(row={"patient_id": "ab12", "query": "x"})
    out = run(mw(ex, next_call))
    assert out.context.params == {"pid": "AB12", "q": "x"}


def test_basic_auth_header():
    mw = BasicAuthMiddleware("user", "pass")

    async def next_call(ex):
        return ex

    out = run(mw(make_exchange(), next_call))
    assert out.context.headers["Authorization"] == "Basic dXNlcjpwYXNz"


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    async def flaky(ex):
        calls["n"] += 1
        ex.status_code = 503 if calls["n"] < 3 else 200
        ex.success = ex.status_code < 500
        ex.error_message = None
        return ex

    mw = RetryMiddleware(max_attempts=5, rng=random.Random(0), sleep=_nosleep)
    out = run(mw(make_exchange(), flaky))
    assert out.status_code == 200
    assert out.attempts == 3


def test_retry_exhaustion_never_raises():
    async def always_503(ex):
        ex.status_code = 503
        return ex

    mw = RetryMiddleware(max_attempts=4, rng=random.Random(0), sleep=_nosleep)
    out = run(mw(make_exchange(), always_503))
    assert out.success is False
    assert out.attempts == 4
    assert "exhausted" in out.error_message


def test_retry_on_transport_error():
    calls = {"n": 0}

    async def conn_refused_then_ok(ex):
        calls["n"] += 1
        if calls["n"] == 1:
            ex.status_code = None
            ex.error_message = "ConnectionError: refused"
        else:
            ex.status_code = 200
            ex.error_message = None
        return ex

    mw = RetryMiddleware(max_attempts=3, rng=random.Random(0), sleep=_nosleep)
    out = run(mw(make_exchange(), conn_refused_then_ok))
    assert out.status_code == 200
    assert out.attempts == 2


async def _nosleep(_):
    return None


def test_json_middleware_success_semantics():
    async def resp_404(ex):
        ex.status_code = 404
        ex.body = b'{"error": "nf"}'
        ex.success = True  # transport says <500 is "success"
        return ex

    out = run(JsonResponseMiddleware()(make_exchange(), resp_404))
    assert out.success is False  # JSON middleware tightens to <400
    assert out.body_text == '{"error": "nf"}'
    assert out.metadata["json"]["valid"] is True


def test_full_chain_with_mock_engine():
    engine = MockEngine()
    executor = RequestExecutor(engine)
    chain = MiddlewarePipeline(
        [
            ParamInjectorMiddleware([("id", "request_id", None)]),
            JsonResponseMiddleware(),
            RetryMiddleware(max_attempts=2, sleep=_nosleep),
        ],
        executor.send,
    )
    ex = make_exchange(row={"request_id": "42"}, request_id="42")
    out = run(chain.execute(ex))
    assert out.status_code == 200
    assert out.success is True
    assert out.attempts == 1
    assert out.body_text == '{"id": "42"}'
    rec = out.build_record()
    assert rec["request_id"] == "42"
    assert rec["status_code"] == 200
    assert len(rec["row_hash"]) == 64


def test_mock_engine_failure_injection():
    engine = MockEngine(fail_first_attempts=2, fail_status=503)
    executor = RequestExecutor(engine)
    chain = MiddlewarePipeline(
        [JsonResponseMiddleware(), RetryMiddleware(max_attempts=5, sleep=_nosleep)],
        executor.send,
    )
    out = run(chain.execute(make_exchange(request_id="a")))
    assert out.status_code == 200
    assert out.attempts == 3  # 2 injected failures + success


def test_transport_error_is_data():
    class BoomEngine(MockEngine):
        async def send(self, request):
            return TransportResponse(error="ConnectTimeout: x")

    executor = RequestExecutor(BoomEngine())
    out = run(executor.send(make_exchange()))
    assert out.success is False
    assert out.status_code is None
    assert "ConnectTimeout" in out.error_message


def test_request_template_renders_row_placeholders():
    from distributed_api_etl_spark.request_execution.middleware.injectors import (
        RequestTemplateMiddleware,
    )

    mw = RequestTemplateMiddleware(
        {
            "patient": {"id": "{patient_id}", "kind": "static"},
            "flags": ["{flag_a}", 7, True],
            "note": "id={patient_id} missing=<{nope}>",
        }
    )

    async def next_call(ex):
        return ex

    ex = make_exchange(row={"patient_id": "P-9", "flag_a": "on"})
    out = run(mw(ex, next_call))
    assert out.context.json_body == {
        "patient": {"id": "P-9", "kind": "static"},
        "flags": ["on", 7, True],
        "note": "id=P-9 missing=<>",
    }


def test_request_template_mapping_overrides_template():
    from distributed_api_etl_spark.request_execution.middleware.injectors import (
        JsonBodyInjectorMiddleware,
        RequestTemplateMiddleware,
    )

    tmpl = RequestTemplateMiddleware({"k": "{a}", "keep": "tmpl"})
    inj = JsonBodyInjectorMiddleware([("k", "b", None)])

    async def terminal(ex):
        return ex

    async def inner(ex):
        return await inj(ex, terminal)

    ex = make_exchange(row={"a": "from_tmpl", "b": "from_mapping"})
    out = run(tmpl(ex, inner))
    assert out.context.json_body == {"k": "from_mapping", "keep": "tmpl"}


def test_template_columns_pruning_set():
    from distributed_api_etl_spark.config.models import EndpointConfig

    ep = EndpointConfig(
        url="http://x",
        request_template={"a": "{col1}", "b": {"c": ["{col2}", "{col1}"]}, "d": 5},
    )
    assert ep.template_columns() == {"col1", "col2"}


def test_pagination_page_mode_stop_on_empty():
    import json as _json

    from distributed_api_etl_spark.request_execution.middleware.interceptors import (
        PaginationMiddleware,
    )

    mw = PaginationMiddleware(
        mode="page", page_param="p", max_pages=10, stop_on_empty_json_path="items"
    )
    served = {"1": ["a", "b"], "2": ["c"], "3": []}

    async def next_call(ex):
        page = ex.context.params["p"]
        ex.body_text = _json.dumps({"items": served.get(page, [])})
        ex.success = True
        ex.status_code = 200
        ex.attempts = 1
        return ex

    ex = make_exchange()
    out = run(mw(ex, next_call))
    pages = _json.loads(out.body_text)
    assert [p["items"] for p in pages] == [["a", "b"], ["c"], []]
    assert out.metadata["pagination"]["pages"] == 3
    assert out.attempts == 3


def test_pagination_cursor_mode():
    import json as _json

    from distributed_api_etl_spark.request_execution.middleware.interceptors import (
        PaginationMiddleware,
    )

    mw = PaginationMiddleware(mode="cursor", cursor_param="c", cursor_json_path="next")
    chain = {None: {"v": 1, "next": "t2"}, "t2": {"v": 2, "next": "t3"}, "t3": {"v": 3}}

    async def next_call(ex):
        cur = ex.context.params.get("c")
        ex.body_text = _json.dumps(chain[cur])
        ex.success = True
        ex.status_code = 200
        ex.attempts = 1
        return ex

    out = run(mw(make_exchange(), next_call))
    pages = _json.loads(out.body_text)
    assert [p["v"] for p in pages] == [1, 2, 3]


def test_pagination_stops_on_failed_page():
    from distributed_api_etl_spark.request_execution.middleware.interceptors import (
        PaginationMiddleware,
    )

    mw = PaginationMiddleware(mode="page", max_pages=5)
    calls = []

    async def next_call(ex):
        calls.append(ex.context.params["page"])
        ex.success = len(calls) < 2
        ex.status_code = 200 if ex.success else 503
        ex.body_text = '{"x": 1}'
        ex.attempts = 1
        return ex

    out = run(mw(make_exchange(), next_call))
    assert calls == ["1", "2"]
    assert out.success is False  # final state reflects the failed page


def test_transport_diagnostics_middleware_attaches_metadata():
    from distributed_api_etl_spark.request_execution.middleware.injectors import (
        TransportDiagnosticsMiddleware,
    )

    mw = TransportDiagnosticsMiddleware(
        engine_info={"engine": "MockEngine", "pool_limit": 7},
        warmup_meta={"dns_ms": 1.2},
    )

    async def next_call(ex):
        return ex

    out = run(mw(make_exchange(), next_call))
    diag = out.metadata["transport"]
    assert diag["engine"] == "MockEngine"
    assert diag["pool_limit"] == 7
    assert diag["connection_warmup"] == {"dns_ms": 1.2}

    # without a warmup probe the key is absent (not None)
    out2 = run(
        TransportDiagnosticsMiddleware(engine_info={"engine": "E"})(
            make_exchange(), next_call
        )
    )
    assert "connection_warmup" not in out2.metadata["transport"]


def test_build_middlewares_diagnostics_toggle():
    from distributed_api_etl_spark.orchestration.partition_executor import (
        build_middlewares,
    )
    from distributed_api_etl_spark.request_execution.middleware.injectors import (
        TransportDiagnosticsMiddleware,
    )

    compiled = {
        "endpoint": {"method": "GET", "url": "http://x"},
        "transport": {"engine": "mock"},
        "execution": {},
    }
    with_diag = build_middlewares(
        compiled, {"engine_info": {"engine": "MockEngine"}, "warmup_meta": None}
    )
    without = build_middlewares(compiled, None)
    assert any(isinstance(m, TransportDiagnosticsMiddleware) for m in with_diag)
    assert not any(isinstance(m, TransportDiagnosticsMiddleware) for m in without)


def test_transport_diagnostics_config_roundtrip():
    """transport.diagnostics survives validation + compile and lands in the
    bronze response_metadata when on (mock engine, single row)."""
    import json as _json

    from distributed_api_etl_spark.config.models import PipelineConfig
    from distributed_api_etl_spark.orchestration.partition_executor import run_rows

    cfg = PipelineConfig.model_validate(
        {
            "endpoint": {"method": "GET", "url": "http://mock.local/api"},
            "transport": {"engine": "mock", "diagnostics": True},
        }
    )
    assert cfg.transport.diagnostics is True
    off = PipelineConfig.model_validate(
        {
            "endpoint": {"method": "GET", "url": "http://mock.local/api"},
            "transport": {"engine": "mock", "diagnostics": False},
        }
    )
    assert off.transport.diagnostics is False

    def compiled_for(c):
        return {
            "endpoint": c.endpoint.model_dump(),
            "transport": c.transport.model_dump(),
            "retry": c.retry.model_dump(),
            "auth": {"type": "none"},
            "middleware": [],
            "execution": c.execution.model_dump(),
        }

    rec_on = next(iter(run_rows([{"request_id": "1"}], compiled_for(cfg))))
    meta_on = _json.loads(rec_on["response_metadata"])
    assert meta_on["transport"]["engine"] == "MockEngine"

    rec_off = next(iter(run_rows([{"request_id": "1"}], compiled_for(off))))
    meta_off = _json.loads(rec_off["response_metadata"])
    assert "transport" not in meta_off
