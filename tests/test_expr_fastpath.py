"""The str-input fast paths' identifier guard (functions.is_ident_path).

The contract: a name the fast path accepts must resolve inside an
F.expr string exactly like F.col would. Niladic functions are the
sharp edge — F.expr('current_date') evaluates today's date, silently
NOT the column — and ANSI-reserved words fail to parse under
spark.sql.ansi.enabled. Pure-python test, no session needed.
"""

from svoe_spark.functions import is_ident_path


def test_plain_and_dotted_identifiers_accepted():
    assert is_ident_path("value")
    assert is_ident_path("a.b.c")
    assert is_ident_path("_x9")


def test_non_identifiers_rejected():
    assert not is_ident_path("a-b")
    assert not is_ident_path("a b")
    assert not is_ident_path("`q`")
    assert not is_ident_path(42)
    assert not is_ident_path("")


def test_niladic_function_names_rejected():
    # these PARSE as functions, not columns — silent wrong values
    for name in (
        "current_date",
        "current_timestamp",
        "current_user",
        "session_user",
        "localtimestamp",
        "CURRENT_DATE",
    ):
        assert not is_ident_path(name), name
    # and inside a dotted path segment too
    assert not is_ident_path("t.current_date")


def test_ansi_reserved_words_rejected():
    for name in ("offset", "position", "fetch", "primary", "references",
                 "trailing", "leading", "both", "column", "constraint"):
        assert not is_ident_path(name), name
