import pytest
from pyspark.sql import functions as F

from seatunnel_spark.transforms import get_transform
from seatunnel_spark.types import ROW_KIND_COL


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [("Joy Ding", 20, 123), ("May Ding", 21, 124), ("Kin Dom", 22, 125)],
        ["name", "age", "card"],
    )


def test_copy(people):
    # docs/en/transform-v2/copy.md example
    out = get_transform("Copy", {"fields": {"name1": "name", "age1": "age"}}).apply(people)
    assert out.columns == ["name", "age", "card", "name1", "age1"]
    row = out.filter("name = 'Joy Ding'").first()
    assert row["name1"] == "Joy Ding" and row["age1"] == 20


def test_field_mapper(people):
    # docs/en/transform-v2/field-mapper.md: select+reorder+rename
    out = get_transform(
        "FieldMapper", {"field_mapper": {"card": "card", "name": "new_name"}}
    ).apply(people)
    assert out.columns == ["card", "new_name"]


def test_filter_include_exclude(people):
    out = get_transform("Filter", {"include_fields": ["name", "card"]}).apply(people)
    assert out.columns == ["name", "card"]
    out = get_transform("Filter", {"exclude_fields": ["card"]}).apply(people)
    assert out.columns == ["name", "age"]
    with pytest.raises(ValueError):
        get_transform("Filter", {}).apply(people)


def test_field_rename(people):
    out = get_transform(
        "FieldRename",
        {
            "convert_case": "UPPER",
            "prefix": "F_",
            "replacements_with_regex": [{"replace_from": "card", "replace_to": "id"}],
        },
    ).apply(people)
    assert out.columns == ["F_NAME", "F_AGE", "F_ID"]


def test_replace_literal_and_regex(people):
    out = get_transform(
        "Replace",
        {"replace_field": "name", "pattern": " ", "replacement": "_"},
    ).apply(people)
    assert out.first()["name"] == "Joy_Ding"
    out = get_transform(
        "Replace",
        {"replace_field": "name", "pattern": r"[aeiou]", "replacement": "*",
         "is_regex": True},
    ).apply(people)
    assert out.first()["name"] == "J*y D*ng"
    out = get_transform(
        "Replace",
        {"replace_field": "name", "pattern": r"[aeiou]", "replacement": "*",
         "is_regex": True, "replace_first": True},
    ).apply(people)
    assert out.first()["name"] == "J*y Ding"


def test_split(people):
    out = get_transform(
        "Split",
        {"separator": " ", "split_field": "name",
         "output_fields": ["first_name", "second_name", "third"]},
    ).apply(people)
    row = out.first()
    assert row["first_name"] == "Joy" and row["second_name"] == "Ding"
    assert row["third"] is None  # null-padded


def test_jsonpath(spark):
    df = spark.createDataFrame(
        [('{"a": {"b": 7}, "arr": [1, 2, 3], "s": "x"}',)], ["data"]
    )
    out = get_transform(
        "JsonPath",
        {
            "columns": [
                {"src_field": "data", "path": "$.a.b", "dest_field": "ab",
                 "dest_type": "int"},
                {"src_field": "data", "path": "$.arr[1]", "dest_field": "a1",
                 "dest_type": "bigint"},
                {"src_field": "data", "path": "$.s", "dest_field": "s"},
            ]
        },
    ).apply(df)
    row = out.first()
    assert row["ab"] == 7 and row["a1"] == 2 and row["s"] == "x"


def test_rowkind_filter_and_extract(spark):
    df = spark.createDataFrame(
        [("+I", 1), ("-U", 1), ("+U", 1), ("-D", 2)], [ROW_KIND_COL, "pk"]
    )
    keep = get_transform("FilterRowKind", {"exclude_kinds": ["-U", "+U"]}).apply(df)
    assert {r[ROW_KIND_COL] for r in keep.collect()} == {"+I", "-D"}
    keep2 = get_transform("FilterRowKind", {"include_kinds": ["INSERT"]}).apply(df)
    assert keep2.count() == 1
    ext = get_transform(
        "RowKindExtractor", {"custom_field_name": "rk", "transform_type": "FULL"}
    ).apply(df)
    assert {r["rk"] for r in ext.collect()} == {
        "INSERT", "UPDATE_BEFORE", "UPDATE_AFTER", "DELETE"
    }


def test_table_merge_and_rename(spark):
    from seatunnel_spark.job.engine import merge_multi_table

    a = spark.createDataFrame([(1,)], ["id"])
    b = spark.createDataFrame([(2,)], ["id"])
    merged = merge_multi_table({"db.user_1": a, "db.user_2": b})
    out = get_transform(
        "TableMerge",
        {"table_match_regex": r"db\.user_.*", "database": "user_db", "table": "all"},
    ).apply(merged)
    assert {r["__table_id"] for r in out.collect()} == {"user_db.all"}
    renamed = get_transform("TableRename", {"prefix": "CDC_"}).apply(out)
    assert {r["__table_id"] for r in renamed.collect()} == {"CDC_user_db.all"}


def test_metadata(spark):
    df = spark.createDataFrame([(1,)], ["id"]).withColumn(
        "__table_id", F.lit("mydb.myschema.mytable")
    )
    out = get_transform(
        "Metadata", {"metadata_fields": {"Database": "db", "Table": "tbl",
                                         "RowKind": "rk"}}
    ).apply(df)
    row = out.first()
    assert row["db"] == "mydb" and row["tbl"] == "mytable" and row["rk"] == "+I"


def test_sql_transform_superset(people):
    # Reference rejects GROUP BY/ORDER BY (ZetaSQLEngine.java:144-157);
    # the rebuild is a strict superset via spark.sql.
    out = get_transform(
        "Sql",
        {"plugin_input": "people_view",
         "query": "SELECT count(*) AS n, max(age) AS m FROM people_view"},
    ).apply(people)
    row = out.first()
    assert row["n"] == 3 and row["m"] == 22


def test_sql_transform_meta_carried_through_multiplication(spark):
    """`a * b AS x` is a row-mapping projection, not SELECT-star: the
    changelog meta columns must still be appended (a bare `*` item, by
    contrast, already includes them via the view)."""
    from seatunnel_spark.types import ROW_KIND_COL

    df = spark.createDataFrame([(2, 3, "+I"), (4, 5, "-D")],
                               f"a int, b int, {ROW_KIND_COL} string")
    out = get_transform(
        "Sql", {"plugin_input": "mul_view",
                "query": "SELECT a * b AS x FROM mul_view"}).apply(df)
    assert ROW_KIND_COL in out.columns
    got = {(r["x"], r[ROW_KIND_COL]) for r in out.collect()}
    assert got == {(6, "+I"), (20, "-D")}

    # bare star: meta present exactly once (no duplicate append)
    out2 = get_transform(
        "Sql", {"plugin_input": "mul_view",
                "query": "SELECT * FROM mul_view"}).apply(df)
    assert out2.columns.count(ROW_KIND_COL) == 1


def test_dynamic_compile(people):
    out = get_transform(
        "DynamicCompile",
        {"source_code": "def transform(pdf):\n"
                        "    pdf['age2'] = pdf['age'] * 2\n"
                        "    return pdf\n"},
    ).apply(people)
    assert out.filter("name = 'Kin Dom'").first()["age2"] == 44


def test_llm_and_embedding_fake(people):
    out = get_transform(
        "LLM",
        {"model_provider": "FAKE", "prompt": "classify", "inference_columns": ["name"]},
    ).apply(people)
    vals = [r["llm_output"] for r in out.collect()]
    assert len(set(vals)) == 3 and all(len(v) == 16 for v in vals)

    emb = get_transform(
        "Embedding",
        {"model_provider": "FAKE", "vectorization_fields": {"vec": "name"},
         "dimension": 8},
    ).apply(people)
    v = emb.first()["vec"]
    assert len(v) == 8
    assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # unit norm


def test_llm_provider_request_shape(monkeypatch):
    """OPENAI/CUSTOM request construction, offline (urlopen patched)."""
    import io
    import json as _json

    from seatunnel_spark.transforms import nlp

    captured = []

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=None):
        body = _json.loads(req.data.decode())
        captured.append((req.full_url, req.headers, body))
        if "embeddings" in req.full_url:
            data = [{"embedding": [0.1, 0.2]} for _ in body["input"]]
            return _Resp(_json.dumps({"data": data}).encode())
        return _Resp(_json.dumps(
            {"choices": [{"message": {"content": "ok"}}]}).encode())

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)

    out = nlp._call_provider(
        "OPENAI", "", "sk-test",
        [{"prompt": "classify", "input": {"text": "hi"}}], model="gpt-4o-mini")
    assert out == ["ok"]
    url, headers, body = captured[0]
    assert url.endswith("/chat/completions")
    assert headers["Authorization"] == "Bearer sk-test"
    # Reference array protocol (AbstractModel.java:77-98): system prompt
    # carries the array-reply rules; user content is a JSON array of rows.
    assert body["messages"][0]["role"] == "system"
    assert body["messages"][0]["content"].startswith("classify")
    assert "result is returned in the form of an array" in body["messages"][0]["content"]
    assert _json.loads(body["messages"][1]["content"]) == [{"text": "hi"}]

    vecs = nlp._call_provider(
        "CUSTOM", "https://my.host/v1/embeddings", "k",
        [{"input": "a"}, {"input": "b"}], mode="embed",
        extra={"batch": 2})
    assert vecs == [[0.1, 0.2], [0.1, 0.2]]
    assert captured[-1][2]["input"] == ["a", "b"]

    # QIANFAN embed is implemented (oauth + token query param);
    # KIMIAI chat shares the OpenAI shape; an unknown provider raises.
    with pytest.raises(NotImplementedError, match="NOPE"):
        nlp._call_provider("NOPE", "", "", [])
