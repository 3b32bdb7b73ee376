"""Schema module: dual id-numbering parity and derived constants.

Pins the invariants the reference hard-codes twice (SURVEY §1.2): the
baseline 57-id map is the BAIDU 55-id map shifted by 2 (O=0, I=1), complex
and affiliated id sets agree across numberings, and the 26-entity-type
universe matches run_mhs.py's s2id construction.
"""

from nlp_series_relation_extraction_ray import schema


def test_baidu_relation_ids():
    assert schema.BAIDU_RELATION["注册资本"] == 0
    assert schema.BAIDU_RELATION["上映时间_@value"] == 6
    assert schema.BAIDU_RELATION["获奖_period"] == 27
    assert schema.BAIDU_RELATION["票房_inArea"] == 45
    assert schema.BAIDU_RELATION["代言人"] == 54
    assert len(schema.BAIDU_RELATION) == 55


def test_baseline_map_is_shifted_baidu_map():
    assert schema.LABEL_MAP["O"] == 0
    assert schema.LABEL_MAP["I"] == 1
    for key, i in schema.BAIDU_RELATION.items():
        assert schema.LABEL_MAP[key] == i + 2
    assert schema.NUM_BASELINE_CLASSES == 112


def test_complex_id_sets_parity():
    # run_evaluation.py:92-93 vs utils/utils.py:192-193
    assert schema.COMPLEX_RELATION_IDS == [6, 8, 24, 30, 44]
    assert schema.COMPLEX_RELATION_AFFI_IDS == [7, 9, 25, 26, 27, 31, 45]
    assert schema.BASELINE_COMPLEX_IDS == [8, 10, 26, 32, 46]
    assert schema.BASELINE_COMPLEX_AFFI_IDS == [9, 11, 27, 28, 29, 33, 47]


def test_id2spo_layout():
    # id2spo.json: two 'empty' slots then predicates; tags kept on object_type
    assert schema.ID2SPO["predicate"][:2] == ["empty", "empty"]
    assert schema.ID2SPO["predicate"][26] == "获奖"
    assert schema.ID2SPO["object_type"][26] == "奖项_@value"
    assert schema.ID2SPO["object_type"][28] == "Date_onDate"
    assert schema.ID2SPO["subject_type"][10] == "娱乐人物"


def test_spo_tag_agreement():
    assert schema.SPO_TAG["predicate"][24] == "获奖"
    assert schema.SPO_TAG["object_type"][45] == "地点_inArea"
    assert len(schema.SPO_TAG["predicate"]) == 55


def test_entity_type_universe():
    # run_mhs.py:125-135: sorted unique base types, ids from 1
    assert schema.E_NUM == 26
    ids = schema.s2id()
    assert min(ids.values()) == 1
    assert max(ids.values()) == 26
    assert "人物" in ids and "影视作品" in ids and "Number" in ids


def test_48_schemas_with_5_complex():
    schemas = schema.predicate_schemas()
    assert len(schemas) == 48
    assert sorted(schema.complex_predicates()) == sorted(
        ["上映时间", "饰演", "获奖", "配音", "票房"]
    )
    award = next(s for s in schemas if s["predicate"] == "获奖")
    assert award["object_type"] == {
        "@value": "奖项", "inWork": "作品", "onDate": "Date", "period": "Number"
    }
