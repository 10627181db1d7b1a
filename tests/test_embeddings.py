"""Embedding provider tests with a local mock HTTP server — the
reference's test pattern (embed_openai_test.go:38-86,
embed_ollama_test.go:31-76): assert URL path, method, auth header and
request body, return a canned vector; plus normalization-autodetect and
Cohere prefix-dispatch behavior. No Spark needed (pure driver-side)."""

from __future__ import annotations

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from chromem_go_spark.embeddings import providers as P


class _MockState:
    def __init__(self, respond):
        self.respond = respond
        self.requests: list[dict] = []


def _serve(state: _MockState):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            rec = {
                "path": self.path,
                "headers": {k.lower(): v for k, v in self.headers.items()},
                "body": body,
            }
            state.requests.append(rec)
            status, payload = state.respond(rec)
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


@pytest.fixture
def mock_server():
    servers = []

    def start(respond):
        state = _MockState(respond)
        srv = _serve(state)
        servers.append(srv)
        return f"http://127.0.0.1:{srv.server_address[1]}", state

    yield start
    for s in servers:
        s.shutdown()
        s.server_close()


NORM3 = [-0.40824828, 0.40824828, 0.81649655]  # normalized


def _norm(v):
    return math.sqrt(sum(x * x for x in v))


def test_openai_compat_request_shape(mock_server):
    def respond(req):
        return 200, {"data": [{"index": i, "embedding": NORM3} for i in range(len(req["body"]["input"]))]}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "secret-key", "test-model", True)
    v = emb.embed("hello world")
    assert v == pytest.approx(NORM3)
    req = state.requests[0]
    assert req["path"] == "/embeddings"
    assert req["headers"]["authorization"] == "Bearer secret-key"
    assert req["headers"]["content-type"] == "application/json"
    assert req["body"] == {"input": ["hello world"], "model": "test-model"}


def test_openai_compat_batches_and_order(mock_server):
    def respond(req):
        # reversed order + index field: client must re-sort by index
        n = len(req["body"]["input"])
        data = [
            {"index": i, "embedding": [float(i + 1), 0.0, 0.0]}
            for i in range(n)
        ]
        return 200, {"data": list(reversed(data))}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", True)
    emb.batch_size = 2
    vecs = emb.embed_batch(["a", "b", "c"])
    assert len(state.requests) == 2  # 2 + 1
    assert [v[0] for v in vecs] == [1.0, 2.0, 1.0]


def test_azure_headers_and_query(mock_server):
    def respond(req):
        return 200, {"data": [{"embedding": NORM3}]}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_azure_openai("azkey", base, "", "dep-model")
    emb.embed("x")
    req = state.requests[0]
    assert req["path"] == f"/embeddings?api-version={P.AZURE_DEFAULT_API_VERSION}"
    assert req["headers"]["api-key"] == "azkey"


def test_normalization_autodetect_normalizes(mock_server):
    raw = [3.0, 4.0, 0.0]  # norm 5 -> must be normalized by the client

    def respond(req):
        return 200, {"data": [{"embedding": raw}]}

    base, _ = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", None)
    v = emb.embed("x")
    assert _norm(v) == pytest.approx(1.0, abs=1e-6)
    assert v == pytest.approx([0.6, 0.8, 0.0])


def test_normalization_autodetect_trusts_normalized(mock_server):
    calls = {"n": 0}

    def respond(req):
        calls["n"] += 1
        # first vector normalized -> autodetect memoizes "trust provider";
        # later unnormalized output passes through (reference sync.Once
        # semantics, embed_openai.go:148-158)
        return 200, {"data": [{"embedding": NORM3 if calls["n"] == 1 else [2.0, 0.0, 0.0]}]}

    base, _ = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", None)
    assert _norm(emb.embed("a")) == pytest.approx(1.0, abs=1e-6)
    assert emb.embed("b") == [2.0, 0.0, 0.0]


def test_normalized_false_always_normalizes(mock_server):
    def respond(req):
        return 200, {"data": [{"embedding": [0.0, 2.0, 0.0]}]}

    base, _ = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", False)
    assert emb.embed("x") == pytest.approx([0.0, 1.0, 0.0])


def test_error_status_golden_message(mock_server):
    def respond(req):
        return 500, {"error": "boom"}

    base, _ = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", True)
    emb.max_retries = 0  # retries off: plain fail-fast golden error
    with pytest.raises(RuntimeError, match="error response from the embedding API"):
        emb.embed("x")


def test_transient_429_retries_then_succeeds(mock_server, monkeypatch):
    """Rate-limit hardening: 429 (and 5xx) retry with exponential
    backoff; the call succeeds once the server recovers."""
    sleeps: list[float] = []
    monkeypatch.setattr(P, "_sleep", sleeps.append)
    calls = {"n": 0}

    def respond(req):
        calls["n"] += 1
        if calls["n"] <= 2:
            return 429, {"error": "rate limited"}
        return 200, {"data": [{"embedding": [1.0, 0.0]}]}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", True)
    assert emb.embed("x") == [1.0, 0.0]
    assert calls["n"] == 3
    assert sleeps == [0.5, 1.0]  # base * 2^attempt


def test_persistent_429_exhausts_budget_with_golden_error(mock_server, monkeypatch):
    monkeypatch.setattr(P, "_sleep", lambda s: None)
    calls = {"n": 0}

    def respond(req):
        calls["n"] += 1
        return 429, {"error": "rate limited"}

    base, _ = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", True)
    emb.max_retries = 2
    with pytest.raises(RuntimeError, match="error response from the embedding API: 429"):
        emb.embed("x")
    assert calls["n"] == 3  # initial + 2 retries, then fail


def test_auth_error_fails_fast_without_retries(mock_server, monkeypatch):
    """A 401 is NOT transient: no sleeps, exactly one request — the
    backoff budget is reserved for rate limits and server errors."""
    sleeps: list[float] = []
    monkeypatch.setattr(P, "_sleep", sleeps.append)
    calls = {"n": 0}

    def respond(req):
        calls["n"] += 1
        return 401, {"error": "bad key"}

    base, _ = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", True)
    with pytest.raises(RuntimeError, match="error response from the embedding API: 401"):
        emb.embed("x")
    assert calls["n"] == 1
    assert sleeps == []


def test_bounded_inflight_parallel_chunks_preserve_order(mock_server):
    """max_inflight > 1 issues chunk requests concurrently (bounded
    thread pool — the reference's semaphore analog) and output order
    still matches input order."""

    def respond(req):
        vecs = [[float(len(t)), 0.0] for t in req["body"]["input"]]
        return 200, {"data": [{"embedding": v, "index": i} for i, v in enumerate(vecs)]}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", True)
    emb.batch_size = 1
    emb.max_inflight = 4
    texts = ["a", "bb", "ccc", "dddd"]
    got = emb.embed_batch(texts)
    assert [v[0] for v in got] == [1.0, 2.0, 3.0, 4.0]
    assert len(state.requests) == 4


def test_empty_response_error(mock_server):
    def respond(req):
        return 200, {"data": []}

    base, _ = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", True)
    with pytest.raises(RuntimeError, match="no embeddings found in the response"):
        emb.embed("x")


def test_ollama_native_endpoint(mock_server):
    def respond(req):
        assert req["path"] == "/embed"
        return 200, {"embeddings": [NORM3 for _ in req["body"]["input"]]}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_ollama("nomic-embed-text", base)
    v = emb.embed("hi")
    assert v == pytest.approx(NORM3)
    assert state.requests[0]["body"] == {"model": "nomic-embed-text", "input": ["hi"]}


def test_cohere_prefix_dispatch(mock_server):
    def respond(req):
        itype = req["body"]["input_type"]
        val = {"search_document": 1.0, "search_query": 2.0}[itype]
        return 200, {"embeddings": [[val, 0.0, 0.0] for _ in req["body"]["texts"]]}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_cohere("ck", "embed-english-v3.0", base_url=base)
    emb.normalized = True  # keep canned values inspectable
    vecs = emb.embed_batch(
        [
            P.COHERE_PREFIX_SEARCH_DOCUMENT + "doc one",
            P.COHERE_PREFIX_SEARCH_QUERY + "the query",
            P.COHERE_PREFIX_SEARCH_DOCUMENT + "doc two",
        ]
    )
    # order preserved across the per-input_type sub-batches
    assert [v[0] for v in vecs] == [1.0, 2.0, 1.0]
    sent = {r["body"]["input_type"]: r["body"]["texts"] for r in state.requests}
    assert sent["search_document"] == ["doc one", "doc two"]  # prefix stripped
    assert sent["search_query"] == ["the query"]
    auth = state.requests[0]["headers"]["authorization"]
    assert auth == "Bearer ck"


def test_cohere_missing_prefix_golden_error():
    emb = P.new_embedding_func_cohere("ck")
    with pytest.raises(ValueError, match="text must start with a valid input type"):
        emb.embed("no prefix here")


def test_vertex_url_and_body(mock_server):
    def respond(req):
        return 200, {"predictions": [{"embeddings": {"values": NORM3}} for _ in req["body"]["instances"]]}

    base, state = mock_server(respond)
    emb = P.new_embedding_func_vertex(
        "vk", "my-proj", "text-embedding-004", api_endpoint=base, auto_truncate=True
    )
    v = emb.embed("x")
    assert v == pytest.approx(NORM3)
    req = state.requests[0]
    assert req["path"] == (
        "/projects/my-proj/locations/us-central1/publishers/google/models/"
        "text-embedding-004:predict"
    )
    assert req["body"]["instances"] == [{"content": "x"}]
    assert req["body"]["parameters"] == {"autoTruncate": True}
    assert req["headers"]["authorization"] == "Bearer vk"


def test_mistral_is_normalized_passthrough(mock_server):
    emb = P.new_embedding_func_mistral("mk")
    assert emb.normalized is True
    assert emb.model == "mistral-embed"


def test_embedder_is_picklable():
    import pickle

    emb = P.new_embedding_func_openai_compat("http://x", "k", "m", None)
    emb2 = pickle.loads(pickle.dumps(emb))
    assert emb2.base_url == "http://x"


def test_pandas_udf_ingest_fills_missing_embeddings(spark, mock_server):
    """DataFrame-scale ingest: rows without embeddings get filled by the
    provider's batched Arrow UDF (executors call the mock server);
    pre-embedded rows are left untouched and never hit the API."""
    from pyspark.sql import functions as F

    from chromem_go_spark.collection import Collection
    from chromem_go_spark.document import DOCUMENT_SCHEMA

    def respond(req):
        texts = req["body"]["input"]
        # deterministic per-text vector: [len, 1, 0] (normalized later)
        return 200, {
            "data": [
                {"index": i, "embedding": [float(len(t)), 1.0, 0.0]}
                for i, t in enumerate(texts)
            ]
        }

    base, state = mock_server(respond)
    emb = P.new_embedding_func_openai_compat(base, "k", "m", False)

    rows = [
        ("pre", {"s": "y"}, [0.0, 0.0, 1.0], "already embedded"),
        ("a", {}, [], "xx"),
        ("b", {}, [], "xxxx"),
    ]
    df = spark.createDataFrame(rows, DOCUMENT_SCHEMA)
    c = Collection(spark, "udf_ingest")
    c.add_df(df, embedder=emb)
    got = {r["id"]: list(r["embedding"]) for r in c.df.collect()}
    assert got["pre"] == pytest.approx([0.0, 0.0, 1.0])
    # [2,1,0] and [4,1,0] normalized
    assert got["a"] == pytest.approx([0.894427, 0.447214, 0.0], abs=1e-5)
    assert got["b"] == pytest.approx([0.970143, 0.242536, 0.0], abs=1e-5)
    sent = [t for r in state.requests for t in r["body"]["input"]]
    assert sorted(sent) == ["xx", "xxxx"]  # pre-embedded row never sent


def test_llamafile_request_shape_and_no_auth(mock_server):
    """llamafile serves the OpenAI-compat surface with no API key and
    a baked-in model — the request must carry no Authorization header
    and tolerate an empty model name (reference roadmap README.md:174)."""
    def respond(req):
        return 200, {
            "data": [
                {"index": i, "embedding": NORM3}
                for i in range(len(req["body"]["input"]))
            ]
        }

    base, state = mock_server(respond)
    emb = P.new_embedding_func_llamafile(base)
    v = emb.embed("hello llamafile")
    assert v == pytest.approx(NORM3)
    req = state.requests[0]
    assert req["path"] == "/embeddings"
    assert "authorization" not in req["headers"]
    assert req["body"]["input"] == ["hello llamafile"]


def test_llamafile_launch_requires_binary(tmp_path):
    with pytest.raises(FileNotFoundError, match="llamafile binary"):
        P.launch_llamafile(str(tmp_path / "nope.llamafile"))
