
import re as _re

#: dotted chain of plain identifiers — the only column references the
#: single-parse (str) fast paths accept. Anything else (spaces,
#: hyphens, reserved-ish punctuation, backticks) falls back to the
#: Column path, which resolves names exactly like F.col always did.
_IDENT_PATH = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")


#: ANSI-reserved (and commonly reserved) SQL words: a column literally
#: named one of these parses differently (or not at all) inside an expr
#: string, while F.col resolves it fine — such names use the Column path.
#: Includes the niladic functions (current_date, current_timestamp,
#: current_user, session_user, localtimestamp, ...): F.expr('current_date')
#: evaluates today's date, NOT a column of that name — silently wrong,
#: not merely unparseable — plus Spark's full ANSI-mode reserved list
#: (offset, position, fetch, primary, references, trailing, ...) which
#: raises ParseException under spark.sql.ansi.enabled where F.col works.
_SQL_RESERVED = frozenset(
    """all and any as at authorization between both by case cast check
    collate column constraint create cross current current_date
    current_time current_timestamp current_user distinct else end
    escape except exists false fetch filter for foreign from full
    grant group having in inner intersect into is join lateral leading
    left like localtime localtimestamp natural not null offset on only
    or order outer overlaps overlay percent position primary references
    right select semi session_user set some table then time to trailing
    true union unique unknown user using when where window with""".split()
)


def is_ident_path(name) -> bool:
    if not isinstance(name, str) or not _IDENT_PATH.match(name):
        return False
    return not any(p.lower() in _SQL_RESERVED for p in name.split("."))
