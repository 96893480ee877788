from node_etl_spark.context import Context, get_path, render_template, set_path


def test_get_path_nested():
    obj = {"a": {"b": [{"c": 1}, {"c": 2}]}}
    assert get_path(obj, "a.b.1.c") == 2
    assert get_path(obj, "a.x", "dflt") == "dflt"


def test_set_path_creates_intermediates():
    obj = {}
    set_path(obj, "a.b.c", 5)
    assert obj == {"a": {"b": {"c": 5}}}


def test_render_template():
    # reference utils.js:145-172 {%path%} substitution
    out = render_template("/api?offset={%offset%}&limit={% limit %}", {"offset": 100, "limit": 50})
    assert out == "/api?offset=100&limit=50"
    assert render_template("x={%missing%}", {}) == "x="


def test_resolve_url_config_var():
    # reference utils.js:22-28 $VAR expansion
    ctx = Context(config={"LOCALFS": "/data"}, args={"year": 2016})
    assert ctx.resolve_url("$LOCALFS/DWC/{%year%}.json") == "/data/DWC/2016.json"


def test_resolve_url_missing_var():
    ctx = Context()
    try:
        ctx.resolve_url("$NOPE_VAR_123/x")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
