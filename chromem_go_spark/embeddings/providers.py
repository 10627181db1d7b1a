"""HTTP embedding providers (reference embed_openai.go / embed_compat.go /
embed_ollama.go / embed_cohere.go / embed_vertex.go).

Each provider is an :class:`Embedder` — a small, picklable object with a
``embed_batch(texts) -> list[list[float]]`` core. From it you get:

- ``as_func()`` — the reference's ``EmbeddingFunc`` shape
  (``text -> vector``, reference db.go:22) for driver-side query
  embedding;
- ``pandas_udf_factory()`` — a batched Arrow ``pandas_udf`` for
  DataFrame-scale embedding. This is a deliberate improvement over the
  reference, which issues ONE HTTP request per text
  (embed_openai.go:84-118); here each Arrow batch is chunked into
  ``batch_size``-text API calls, so a 100 TB ingest amortizes request
  overhead and the number of concurrent API calls is bounded by the
  number of running tasks (the analog of the reference's semaphore,
  collection.go:203-242).

Normalization: the reference checks the first returned vector once per
func (``sync.Once``, embed_openai.go:148-158) and normalizes every
vector if the provider doesn't. ``normalized`` here is the same
tri-state: True (trust provider), False (always normalize), None
(autodetect on first vector, ε=1e-6 — reference vector.go:8,55-62).

Only stdlib HTTP (urllib) — no third-party clients.
"""

from __future__ import annotations

import json
import math
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field

BASE_URL_OPENAI = "https://api.openai.com/v1"
BASE_URL_MISTRAL = "https://api.mistral.ai/v1"
BASE_URL_JINA = "https://api.jina.ai/v1"
BASE_URL_MIXEDBREAD = "https://api.mixedbread.ai"
BASE_URL_LOCALAI = "http://localhost:8080/v1"
BASE_URL_OLLAMA = "http://localhost:11434/api"
BASE_URL_COHERE = "https://api.cohere.ai/v1"
BASE_URL_VERTEX = "https://us-central1-aiplatform.googleapis.com/v1"

# reference embed_openai.go:19-24
MODEL_OPENAI_ADA_002 = "text-embedding-ada-002"
MODEL_OPENAI_3_SMALL = "text-embedding-3-small"
MODEL_OPENAI_3_LARGE = "text-embedding-3-large"

AZURE_DEFAULT_API_VERSION = "2024-02-01"  # reference embed_compat.go:93-95

# Cohere input-type dispatch prefixes (reference embed_cohere.go:28-43):
# the prefix selects the API's input_type and is stripped before the call.
COHERE_PREFIX_SEARCH_DOCUMENT = "search_document: "
COHERE_PREFIX_SEARCH_QUERY = "search_query: "
COHERE_PREFIX_CLASSIFICATION = "classification: "
COHERE_PREFIX_CLUSTERING = "clustering: "
_COHERE_PREFIXES = {
    "search_document": COHERE_PREFIX_SEARCH_DOCUMENT,
    "search_query": COHERE_PREFIX_SEARCH_QUERY,
    "classification": COHERE_PREFIX_CLASSIFICATION,
    "clustering": COHERE_PREFIX_CLUSTERING,
}

_NORM_EPS = 1e-6  # reference vector.go:8


def _is_normalized(v: Sequence[float]) -> bool:
    return abs(math.sqrt(sum(x * x for x in v)) - 1.0) < _NORM_EPS


def _normalize(v: Sequence[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in v))
    if n == 0:
        return [float(x) for x in v]
    return [float(x) / n for x in v]


_sleep = time.sleep  # monkeypatch point for backoff tests


def _http_post_json(
    url: str,
    body: dict,
    headers: dict[str, str],
    timeout: float,
    max_retries: int = 3,
    retry_backoff: float = 0.5,
) -> dict:
    """POST with bounded retry on TRANSIENT statuses (429 rate limit,
    5xx): exponential backoff (base * 2^attempt), honoring a numeric
    Retry-After header when the server sends one.  Every other status
    fails fast with the reference's golden error string (reference
    embed_openai.go:103-105) — a 401 must not burn the backoff budget."""
    data = json.dumps(body).encode()
    for attempt in range(max_retries + 1):
        req = urllib.request.Request(url, data=data, method="POST")
        req.add_header("Content-Type", "application/json")
        for k, v in headers.items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                if resp.status != 200:
                    raise RuntimeError(
                        f"error response from the embedding API: {resp.status}"
                    )
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            transient = e.code == 429 or e.code >= 500
            if not transient or attempt >= max_retries:
                raise RuntimeError(
                    f"error response from the embedding API: {e.code} {e.reason}"
                ) from e
            delay = retry_backoff * (2**attempt)
            ra = e.headers.get("Retry-After") if e.headers else None
            if ra:
                try:
                    delay = max(delay, float(ra))
                except ValueError:
                    pass
            _sleep(delay)
    raise AssertionError("unreachable")


@dataclass
class Embedder:
    """Base: request shaping lives in subclasses; normalization memoizing
    and func/UDF adaptation live here."""

    normalized: bool | None = None
    timeout: float = 60.0
    batch_size: int = 64
    # Rate-limit hardening: transient statuses (429/5xx) retry with
    # exponential backoff inside the worker (see _http_post_json);
    # max_inflight bounds CONCURRENT API calls issued by one
    # embed_batch call (reference semaphore analog, collection.go:
    # 203-242 — cluster-wide in-flight is max_inflight x running tasks).
    max_retries: int = 3
    retry_backoff: float = 0.5
    max_inflight: int = 1
    # per-instance memo of the autodetect (reference sync.Once); NOT part
    # of pickled executor state semantics — each executor re-detects once,
    # which is equivalent.
    _checked_normalized: bool | None = field(default=None, repr=False, compare=False)

    # -- subclass surface ------------------------------------------------
    def _request_batch(self, texts: list[str]) -> list[list[float]]:
        raise NotImplementedError

    # -- core ------------------------------------------------------------
    def _post(self, url: str, body: dict, headers: dict[str, str]) -> dict:
        return _http_post_json(
            url, body, headers, self.timeout, self.max_retries, self.retry_backoff
        )

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        chunks = [
            [str(t) for t in texts[i : i + self.batch_size]]
            for i in range(0, len(texts), self.batch_size)
        ]
        if self.max_inflight > 1 and len(chunks) > 1:
            # bounded in-flight requests; fail-fast — the first error
            # propagates and undispatched chunks are cancelled (the
            # reference's errgroup-with-semaphore shape)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=int(self.max_inflight)) as ex:
                results = list(ex.map(self._request_batch, chunks))
        else:
            results = [self._request_batch(c) for c in chunks]
        out: list[list[float]] = []
        for chunk, vecs in zip(chunks, results):
            if len(vecs) != len(chunk):
                raise RuntimeError(
                    "no embeddings found in the response"
                    if not vecs
                    else f"embedding count mismatch: sent {len(chunk)} texts, got {len(vecs)} vectors"
                )
            for v in vecs:
                if not v:
                    raise RuntimeError("no embeddings found in the response")
                out.append(self._maybe_normalize([float(x) for x in v]))
        return out

    def _maybe_normalize(self, v: list[float]) -> list[float]:
        if self.normalized is True:
            return v
        if self.normalized is False:
            return _normalize(v)
        if self._checked_normalized is None:
            self._checked_normalized = _is_normalized(v)
        return v if self._checked_normalized else _normalize(v)

    def embed(self, text: str) -> list[float]:
        return self.embed_batch([text])[0]

    def as_func(self):
        """The reference's EmbeddingFunc shape (text -> vector)."""
        return self.embed

    def pandas_udf_factory(self):
        """Batched Arrow UDF: ``df.withColumn('embedding', udf('content'))``.

        Iterator-of-series form so per-executor setup (autodetect) runs
        once per task, not once per batch.
        """
        from ._udf import make_embed_series_udf

        return make_embed_series_udf(self)


@dataclass
class OpenAICompatEmbedder(Embedder):
    """POST {base_url}/embeddings with {"input": [...], "model": ...}
    (reference newEmbeddingFuncOpenAICompat embed_openai.go:73-161).
    Extra headers/query params cover Azure (api-key header + api-version
    query param, embed_compat.go:98-103)."""

    base_url: str = BASE_URL_OPENAI
    api_key: str = ""
    model: str = MODEL_OPENAI_3_SMALL
    headers: dict[str, str] = field(default_factory=dict)
    query_params: dict[str, str] = field(default_factory=dict)

    def _request_batch(self, texts: list[str]) -> list[list[float]]:
        url = self.base_url.rstrip("/") + "/embeddings"
        if self.query_params:
            url += "?" + urllib.parse.urlencode(self.query_params)
        hdrs = dict(self.headers)
        if self.api_key:
            hdrs.setdefault("Authorization", f"Bearer {self.api_key}")
        resp = self._post(url, {"input": texts, "model": self.model}, hdrs)
        data = resp.get("data") or []
        # OpenAI may return out of order; sort by index when present.
        if data and isinstance(data[0], dict) and "index" in data[0]:
            data = sorted(data, key=lambda d: d["index"])
        return [d.get("embedding") or [] for d in data]


@dataclass
class OllamaEmbedder(Embedder):
    """Ollama native endpoint: POST {base}/embed with {"model","input"},
    response {"embeddings": [[...]]} (reference embed_ollama.go:26-100)."""

    base_url: str = BASE_URL_OLLAMA
    model: str = "nomic-embed-text"

    def _request_batch(self, texts: list[str]) -> list[list[float]]:
        resp = self._post(
            self.base_url.rstrip("/") + "/embed",
            {"model": self.model, "input": texts},
            {},
        )
        return resp.get("embeddings") or []


@dataclass
class CohereEmbedder(Embedder):
    """Cohere with input-type dispatch via content prefixes (reference
    embed_cohere.go:84-168): each text must start with one of the four
    prefixes; it selects ``input_type`` and is stripped before the call.
    Texts in one API batch must share an input_type, so the batch is
    sub-grouped by type while preserving output order."""

    base_url: str = BASE_URL_COHERE
    api_key: str = ""
    model: str = "embed-english-v3.0"

    def _split(self, text: str) -> tuple[str, str]:
        for input_type, prefix in _COHERE_PREFIXES.items():
            if text.startswith(prefix):
                return input_type, text[len(prefix) :]
        # golden error (reference embed_cohere.go:81-83)
        raise ValueError(
            "text must start with a valid input type plus colon and space"
        )

    def _request_batch(self, texts: list[str]) -> list[list[float]]:
        split = [self._split(t) for t in texts]
        out: list[list[float] | None] = [None] * len(texts)
        by_type: dict[str, list[int]] = {}
        for i, (itype, _) in enumerate(split):
            by_type.setdefault(itype, []).append(i)
        for itype, idxs in by_type.items():
            resp = self._post(
                self.base_url.rstrip("/") + "/embed",
                {
                    "model": self.model,
                    "texts": [split[i][1] for i in idxs],
                    "input_type": itype,
                },
                {
                    "Accept": "application/json",
                    "Authorization": f"Bearer {self.api_key}",
                },
            )
            vecs = resp.get("embeddings") or []
            if len(vecs) != len(idxs):
                raise RuntimeError("no embeddings found in the response")
            for i, v in zip(idxs, vecs):
                out[i] = v
        return [v if v is not None else [] for v in out]


@dataclass
class VertexEmbedder(Embedder):
    """Google Vertex AI (reference embed_vertex.go:69-159): POST
    {endpoint}/projects/{project}/locations/us-central1/publishers/google/
    models/{model}:predict with instances=[{content}], parameters
    {autoTruncate}. Options mirror WithVertexAPIEndpoint /
    WithVertexAutoTruncate (embed_vertex.go:42-54)."""

    api_key: str = ""
    project: str = ""
    model: str = "text-embedding-004"
    api_endpoint: str = BASE_URL_VERTEX
    auto_truncate: bool = False

    def _request_batch(self, texts: list[str]) -> list[list[float]]:
        url = (
            f"{self.api_endpoint.rstrip('/')}/projects/{self.project}"
            f"/locations/us-central1/publishers/google/models/{self.model}:predict"
        )
        resp = self._post(
            url,
            {
                "instances": [{"content": t} for t in texts],
                "parameters": {"autoTruncate": self.auto_truncate},
            },
            {
                "Accept": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        preds = resp.get("predictions") or []
        return [
            (p.get("embeddings") or {}).get("values") or [] for p in preds
        ]


# ---------------------------------------------------------------- ctors
# Constructor-per-provider parity with reference embed_*.go.


def new_embedding_func_default() -> OpenAICompatEmbedder:
    """OpenAI text-embedding-3-small, key from $OPENAI_API_KEY
    (reference embed_openai.go:36-39)."""
    return new_embedding_func_openai(
        os.environ.get("OPENAI_API_KEY", ""), MODEL_OPENAI_3_SMALL
    )


def new_embedding_func_openai(api_key: str, model: str = MODEL_OPENAI_3_SMALL) -> OpenAICompatEmbedder:
    # OpenAI embeddings are normalized (reference embed_openai.go:43-47).
    return OpenAICompatEmbedder(
        base_url=BASE_URL_OPENAI, api_key=api_key, model=model, normalized=True
    )


def new_embedding_func_openai_compat(
    base_url: str,
    api_key: str,
    model: str,
    normalized: bool | None = None,
    headers: dict[str, str] | None = None,
    query_params: dict[str, str] | None = None,
) -> OpenAICompatEmbedder:
    return OpenAICompatEmbedder(
        base_url=base_url,
        api_key=api_key,
        model=model,
        normalized=normalized,
        headers=dict(headers or {}),
        query_params=dict(query_params or {}),
    )


def new_embedding_func_azure_openai(
    api_key: str, deployment_url: str, api_version: str = "", model: str = ""
) -> OpenAICompatEmbedder:
    """Azure OpenAI (reference embed_compat.go:98-103): api-key header +
    api-version query param."""
    return new_embedding_func_openai_compat(
        deployment_url,
        api_key,
        model,
        None,
        headers={"api-key": api_key},
        query_params={"api-version": api_version or AZURE_DEFAULT_API_VERSION},
    )


def new_embedding_func_mistral(api_key: str) -> OpenAICompatEmbedder:
    # Mistral embeddings are normalized (reference embed_compat.go:11-19).
    return new_embedding_func_openai_compat(
        BASE_URL_MISTRAL, api_key, "mistral-embed", True
    )


def new_embedding_func_jina(api_key: str, model: str = "jina-embeddings-v2-base-en") -> OpenAICompatEmbedder:
    return new_embedding_func_openai_compat(BASE_URL_JINA, api_key, model)


def new_embedding_func_mixedbread(api_key: str, model: str = "mxbai-embed-large-v1") -> OpenAICompatEmbedder:
    return new_embedding_func_openai_compat(BASE_URL_MIXEDBREAD, api_key, model)


def new_embedding_func_localai(model: str) -> OpenAICompatEmbedder:
    return new_embedding_func_openai_compat(BASE_URL_LOCALAI, "", model)


def new_embedding_func_ollama(model: str, base_url: str = "") -> OllamaEmbedder:
    return OllamaEmbedder(base_url=base_url or BASE_URL_OLLAMA, model=model)


BASE_URL_LLAMAFILE = "http://localhost:8080/v1"


def new_embedding_func_llamafile(
    base_url: str = "", model: str = ""
) -> OpenAICompatEmbedder:
    """llamafile-served embeddings — the reference's roadmap
    EmbeddingFunc (reference README.md:174: "downloads and shells out
    to llamafile").  A running llamafile exposes an OpenAI-compatible
    server (default port 8080), so the request shape is the compat
    path; the model name is baked into the llamafile binary, so it may
    be empty.  Pair with :func:`launch_llamafile` to own the process."""
    return new_embedding_func_openai_compat(
        base_url or BASE_URL_LLAMAFILE, "", model
    )


def launch_llamafile(
    binary_path: str, port: int = 8080, extra_args: list[str] | None = None
):
    """Start a llamafile server subprocess (``--server --embedding``)
    and return the Popen handle; callers terminate it when done.  The
    reference roadmap's "download and shell out" step minus the
    download (no network in CI — the binary path must exist).  Raises
    FileNotFoundError when the binary is absent: like the PIL codecs,
    the shell-out is environment-gated while the request path
    (:func:`new_embedding_func_llamafile`) is fully mock-tested."""
    import subprocess

    if not os.path.exists(binary_path):
        raise FileNotFoundError(
            f"llamafile binary not found at {binary_path}; download one "
            "from the llamafile releases and pass its path"
        )
    return subprocess.Popen(
        [binary_path, "--server", "--embedding", "--port", str(port),
         "--nobrowser", *(extra_args or [])],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def new_embedding_func_cohere(
    api_key: str, model: str = "embed-english-v3.0", base_url: str = ""
) -> CohereEmbedder:
    return CohereEmbedder(
        api_key=api_key, model=model, base_url=base_url or BASE_URL_COHERE
    )


def new_embedding_func_vertex(
    api_key: str,
    project: str,
    model: str = "text-embedding-004",
    api_endpoint: str = "",
    auto_truncate: bool = False,
) -> VertexEmbedder:
    return VertexEmbedder(
        api_key=api_key,
        project=project,
        model=model,
        api_endpoint=api_endpoint or BASE_URL_VERTEX,
        auto_truncate=auto_truncate,
    )
