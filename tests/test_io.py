"""Gazepoint record parsing (sensor.py FPOGX/FPOGY contract)."""

from gabril_carla_tpu.io import parse_gazepoint_records


def test_parse_valid_records():
    payload = (
        '<REC TIME="1.0" FPOGX="0.51" FPOGY="0.32" FPOGV="1" />'
        '<REC TIME="1.1" FPOGX="0.55" FPOGY="0.30" FPOGV="1" />'
    )
    recs = parse_gazepoint_records(payload)
    assert recs == [(0.51, 0.32, True), (0.55, 0.30, True)]


def test_invalid_and_out_of_range_filtered():
    payload = (
        '<REC FPOGX="0.51" FPOGY="0.32" FPOGV="0" />'
        '<REC FPOGX="1.40" FPOGY="0.30" FPOGV="1" />'
        '<REC FPOGX="-0.1" FPOGY="0.30" FPOGV="1" />'
    )
    recs = parse_gazepoint_records(payload)
    assert [v for _, _, v in recs] == [False, False, False]
