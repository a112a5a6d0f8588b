"""LLM + Embedding transforms — batched model inference over rows.

Reference: transform/nlpmodel/llm/LLMTransform.java:44 and
nlpmodel/embedding/EmbeddingTransform.java:47
(docs/en/transform-v2/llm.md, embedding.md): per-row inference against
a provider (OPENAI / KIMIAI / MICROSOFT / QIANFAN / DOUBAO / CUSTOM),
prompt + inference_columns -> output column.

Spark-native design: Arrow-batched ``mapInPandas`` so each Python
worker holds ONE http session and sends batched requests — at 100 TB
this is the only shape that works (per-row UDF would make 10^11 http
calls from the JVM boundary row by row).

OPENAI/CUSTOM (any OpenAI-compatible endpoint) are implemented with a
plain urllib POST in ``_call_provider`` — request construction is
unit-tested offline; a deterministic ``FAKE`` provider exists for
tests/pipelines; the remaining named providers raise with their
request shape documented.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, functions as F, types as T

from seatunnel_spark.transforms.base import Transform
from seatunnel_spark.types import parse_type

_REAL_PROVIDERS = ("OPENAI", "KIMIAI", "MICROSOFT", "QIANFAN", "DOUBAO", "CUSTOM")


_DEFAULT_PATHS = {
    "OPENAI": "https://api.openai.com/v1/chat/completions",
    "OPENAI_EMBED": "https://api.openai.com/v1/embeddings",
}


def _post_json(url: str, api_key: str, body: dict) -> dict:
    from urllib.request import Request, urlopen

    req = Request(
        url,
        data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json",
                 "Authorization": f"Bearer {api_key}"},
        method="POST",
    )
    with urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _call_provider(provider: str, api_path: str, api_key: str,
                   payloads: list[dict], model: str = "",
                   mode: str = "chat") -> list:
    """One batched provider call per Arrow batch. OPENAI and CUSTOM
    (OpenAI-compatible endpoint) are implemented with a plain urllib
    POST — request construction is unit-tested offline; in an
    airgapped environment this fails at connect time with the real
    URLError, not a stub error. Other providers raise with their
    request shape named. Swap the sequential loop for an async pool if
    per-call latency dominates (the mapInPandas batching already
    amortizes session setup)."""
    if provider in ("OPENAI", "CUSTOM"):
        if mode == "embed":
            url = api_path or _DEFAULT_PATHS["OPENAI_EMBED"]
            body = {"model": model or "text-embedding-3-small",
                    "input": [p["input"] for p in payloads]}
            out = _post_json(url, api_key, body)
            return [d["embedding"] for d in out["data"]]
        url = api_path or _DEFAULT_PATHS["OPENAI"]
        answers = []
        for p in payloads:
            body = {
                "model": model or "gpt-4o-mini",
                "messages": [
                    {"role": "system", "content": p["prompt"]},
                    {"role": "user", "content": json.dumps(p["input"],
                                                           default=str)},
                ],
            }
            out = _post_json(url, api_key, body)
            answers.append(out["choices"][0]["message"]["content"])
        return answers
    raise NotImplementedError(
        f"provider {provider}: shape = POST {api_path or '<provider url>'} with "
        "bearer auth, body per provider docs (KIMIAI/MICROSOFT/QIANFAN/DOUBAO); "
        "use CUSTOM with api_path for any OpenAI-compatible endpoint"
    )


class LLMTransform(Transform):
    """Options (docs/en/transform-v2/llm.md): model_provider, model,
    prompt, output_data_type (default STRING), output_column_name
    (default llm_output), inference_columns, api_key, api_path."""

    NAME = "LLM"

    def apply(self, df: DataFrame) -> DataFrame:
        provider = str(self.require("model_provider")).upper()
        prompt = self.require("prompt")
        out_col = self.opt("output_column_name", "llm_output")
        out_type = parse_type(self.opt("output_data_type", "string"))
        infer_cols = self.opt("inference_columns") or df.columns
        api_path = self.opt("api_path", "")
        api_key = self.opt("api_key", "")
        model = str(self.opt("model", ""))

        out_schema = T.StructType(
            df.schema.fields + [T.StructField(out_col, out_type, True)]
        )

        def run_batches(iterator):
            for pdf in iterator:
                payloads = [
                    {"prompt": prompt, "input": {c: row[c] for c in infer_cols}}
                    for _, row in pdf.iterrows()
                ]
                if provider == "FAKE":
                    # Deterministic fake: stable hash of prompt+input.
                    answers = [
                        hashlib.sha256(repr((prompt, p["input"])).encode()).hexdigest()[:16]
                        for p in payloads
                    ]
                else:
                    answers = _call_provider(provider, api_path, api_key, payloads,
                                             model=model, mode="chat")
                pdf[out_col] = answers
                yield pdf

        return df.mapInPandas(run_batches, schema=out_schema)


class EmbeddingTransform(Transform):
    """Options (docs/en/transform-v2/embedding.md): model_provider, model,
    vectorization_fields {out_vec_col = text_col}, api_key, api_path,
    single_vectorized_input_number (batch size)."""

    NAME = "Embedding"

    def apply(self, df: DataFrame) -> DataFrame:
        provider = str(self.require("model_provider")).upper()
        vec_fields: dict = self.require("vectorization_fields")
        dim = int(self.opt("dimension", 8))
        api_path = self.opt("api_path", "")
        api_key = self.opt("api_key", "")
        model = str(self.opt("model", ""))

        out_schema = T.StructType(
            df.schema.fields
            + [
                T.StructField(out, T.ArrayType(T.FloatType()), True)
                for out in vec_fields
            ]
        )

        def embed_batches(iterator):
            import numpy as np

            for pdf in iterator:
                for out, src in vec_fields.items():
                    texts = pdf[src].astype(str).tolist()
                    if provider == "FAKE":
                        # Deterministic unit-norm vector from a text digest —
                        # same shape/latency profile as a real provider batch.
                        vecs = []
                        for t in texts:
                            h = hashlib.sha256(t.encode()).digest()
                            v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4],
                                              dtype=np.uint32).astype(np.float64)
                            v = v / (np.linalg.norm(v) or 1.0)
                            vecs.append(v.astype(np.float32).tolist())
                    else:
                        vecs = _call_provider(
                            provider, api_path, api_key,
                            [{"input": t} for t in texts],
                            model=model, mode="embed",
                        )
                    pdf[out] = vecs
                yield pdf

        return df.mapInPandas(embed_batches, schema=out_schema)
