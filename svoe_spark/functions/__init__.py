
import re as _re

#: dotted chain of plain identifiers — the only column references the
#: single-parse (str) fast paths accept. Anything else (spaces,
#: hyphens, reserved-ish punctuation, backticks) falls back to the
#: Column path, which resolves names exactly like F.col always did.
_IDENT_PATH = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")


#: ANSI-reserved (and commonly reserved) SQL words: a column literally
#: named one of these parses differently (or not at all) inside an expr
#: string, while F.col resolves it fine — such names use the Column path.
_SQL_RESERVED = frozenset(
    """all and any as at between by case cast create cross current
    distinct else end escape except exists false filter for from full
    grant group having in inner intersect into is join lateral left
    like natural not null on only or order outer overlaps right select
    semi set some table then time to true union unique unknown user
    using when where with""".split()
)


def is_ident_path(name) -> bool:
    if not isinstance(name, str) or not _IDENT_PATH.match(name):
        return False
    return not any(p.lower() in _SQL_RESERVED for p in name.split("."))
