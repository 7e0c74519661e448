from __future__ import annotations

from orientdb_etl_spark.exprs import render_value, translate_osql


def test_simple_methods():
    assert translate_osql("name.trim()") == "trim(name)"
    assert translate_osql("name.toUpperCase()") == "upper(name)"
    assert translate_osql("name.toLowerCase()") == "lower(name)"
    assert translate_osql("name.length()") == "length(name)"


def test_chained_methods():
    assert translate_osql("c_name.trim().toUpperCase()") == "upper(trim(c_name))"


def test_sysdate():
    assert translate_osql("sysdate()") == "current_timestamp()"


def test_append():
    assert translate_osql("$s.append($x)") == "concat(s, x)"


def test_substring_zero_based():
    out = translate_osql("name.substring(1, 3)")
    assert out == "substring(name, (1) + 1, (3) - (1))"


def test_indexof_zero_based():
    assert translate_osql("name.indexOf('x')") == "(instr(name, 'x') - 1)"


def test_variable_literal_substitution():
    assert translate_osql("x > $minVal", {"minVal": 5}) == "x > 5"
    assert translate_osql("s = $tag", {"tag": "a'b"}) == "s = 'a''b'"


def test_passthrough_sql():
    sql = "CASE WHEN a > 1 THEN 'x' ELSE 'y' END"
    assert translate_osql(sql) == sql


def test_render_whole_variable():
    assert render_value("$name", {"name": [1, 2]}) == [1, 2]


def test_render_interpolation():
    assert render_value("/data/${dir}/f.csv", {"dir": "abc"}) == "/data/abc/f.csv"


def test_render_nested():
    out = render_value({"path": "${p}", "n": 3, "list": ["$v"]}, {"p": "x", "v": 9})
    assert out == {"path": "x", "n": 3, "list": [9]}
