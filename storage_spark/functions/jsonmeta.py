"""jsonb metadata filter DSL → Column compiler.

Port of the reference's S3Vectors filter grammar
(src/storage/protocols/vector/adapter/pgvector/filter.ts:1-327) with its
exact tri-type semantics:

- ``$eq`` matches scalar-equals OR json-array-contains (filter.ts:122-128);
- ``$ne`` on an array value means NOT-contains, on a scalar means ``<>``
  (filter.ts:130-139 CASE on jsonb_typeof);
- ``$gt/$gte/$lt/$lte`` apply only when the value is a JSON number
  (typeof guard, filter.ts:162-179) — non-numeric values never match;
- ``$in``/``$nin`` are the set forms of the same scalar-or-array logic
  (filter.ts:141-158);
- ``$exists`` is key-presence — a key holding JSON ``null`` EXISTS
  (jsonb_exists semantics, filter.ts:198-210);
- ``$and``/``$or`` must be the only key of their object and take a
  non-empty list (filter.ts:253-274); multiple fields / multiple operators
  AND together (filter.ts:236-241, 281-284).

The metadata column is a JSON string (the engine's jsonb representation,
SURVEY §1.2); we parse it once to Spark 4 VariantType and compile the AST to
a single Column expression — JVM-side, codegen'd, no Python in the row path.
All value accesses use ``$['key']`` bracket paths so arbitrary key names
(dots, spaces, hyphens) work, mirroring the reference's parameterized-key
design (filter.ts:55-66).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

FIELD_OPERATORS = {"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists"}

_NUMERIC_SCHEMAS = ("BIGINT", "DOUBLE", "FLOAT", "DECIMAL", "INT", "SMALLINT", "TINYINT")


class FilterError(ValueError):
    """Invalid filter AST (mirrors the reference's InvalidParameter errors)."""


def _primitive_as_text(value: Any) -> str:
    """JS String(value) semantics for scalar comparisons (filter.ts:86-89)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value.is_integer():
        # JS String(1.0) === '1'
        return str(int(value))
    return str(value)


def _validate_primitive(value: Any) -> Any:
    if isinstance(value, bool) or isinstance(value, str):
        return value
    if isinstance(value, (int, float)):
        if isinstance(value, float) and not (value == value and abs(value) != float("inf")):
            raise FilterError(f"Filter values must be finite numbers, got: {value}")
        return value
    raise FilterError(f"Unsupported filter value type: {type(value).__name__}")


def _path(field: str) -> str:
    # Spark's variant path grammar has NO escape sequence inside ['...'] —
    # a quote in the key would build an invalid path and surface as
    # INVALID_VARIANT_GET_PATH at execution. Refuse it up front as a
    # FilterError (grammar violation), the same class of rejection the
    # reference's InvalidParameter gives malformed filters.
    if "'" in field or '"' in field:
        raise FilterError(f"Unsupported quote character in metadata key: {field!r}")
    return f"$['{field}']"


class _Compiler:
    def __init__(self, variant: Column):
        self.v = variant

    def node(self, field: str) -> Column:
        return F.try_variant_get(self.v, _path(field), "variant")

    def text(self, field: str) -> Column:
        return F.try_variant_get(self.v, _path(field), "string")

    def num(self, field: str) -> Column:
        return F.try_variant_get(self.v, _path(field), "double")

    def arr_text(self, field: str) -> Column:
        return F.try_variant_get(self.v, _path(field), "array<string>")

    def typeof(self, field: str) -> Column:
        return F.schema_of_variant(self.node(field))

    def is_array(self, field: str) -> Column:
        return F.coalesce(self.typeof(field).startswith("ARRAY"), F.lit(False))

    def is_number(self, field: str) -> Column:
        t = self.typeof(field)
        cond = t.startswith("DECIMAL")
        for s in _NUMERIC_SCHEMAS:
            cond = cond | (t == s)
        return F.coalesce(cond, F.lit(False))

    # -- operator translations ------------------------------------------

    def array_contains(self, field: str, text: str) -> Column:
        return F.coalesce(
            F.array_contains(self.arr_text(field), F.lit(text)), F.lit(False)
        )

    def scalar_or_array_eq(self, field: str, value: Any) -> Column:
        text = _primitive_as_text(value)
        scalar = F.coalesce(self.text(field) == text, F.lit(False))
        return F.when(self.is_array(field), self.array_contains(field, text)).otherwise(
            scalar
        )

    def scalar_and_array_ne(self, field: str, value: Any) -> Column:
        text = _primitive_as_text(value)
        scalar_ne = F.coalesce(self.text(field) != text, F.lit(False))
        return F.when(
            self.is_array(field), ~self.array_contains(field, text)
        ).otherwise(scalar_ne)

    def scalar_or_array_in(self, field: str, values: list[Any]) -> Column:
        texts = [_primitive_as_text(v) for v in values]
        scalar = F.coalesce(self.text(field).isin(texts), F.lit(False))
        any_contains = F.lit(False)
        for t in texts:
            any_contains = any_contains | self.array_contains(field, t)
        return F.when(self.is_array(field), any_contains).otherwise(scalar)

    def scalar_and_array_nin(self, field: str, values: list[Any]) -> Column:
        texts = [_primitive_as_text(v) for v in values]
        scalar_nin = F.coalesce(~self.text(field).isin(texts), F.lit(False))
        any_contains = F.lit(False)
        for t in texts:
            any_contains = any_contains | self.array_contains(field, t)
        return F.when(self.is_array(field), ~any_contains).otherwise(scalar_nin)

    def numeric_cmp(self, field: str, op: str, value: float) -> Column:
        n = self.num(field)
        cmp = {
            "$gt": n > value,
            "$gte": n >= value,
            "$lt": n < value,
            "$lte": n <= value,
        }[op]
        return self.is_number(field) & F.coalesce(cmp, F.lit(False))

    def exists(self, field: str, expected: bool) -> Column:
        present = self.node(field).isNotNull()
        return present if expected else ~present

    # -- AST walk -------------------------------------------------------

    def field_operator(self, field: str, op: str, raw: Any) -> Column:
        if op in ("$eq", "$ne"):
            v = _validate_primitive(raw)
            return (
                self.scalar_or_array_eq(field, v)
                if op == "$eq"
                else self.scalar_and_array_ne(field, v)
            )
        if op in ("$gt", "$gte", "$lt", "$lte"):
            if isinstance(raw, bool) or not isinstance(raw, (int, float)):
                raise FilterError(f'{op} requires a number for "{field}"')
            _validate_primitive(raw)
            return self.numeric_cmp(field, op, raw)
        if op in ("$in", "$nin"):
            if not isinstance(raw, list) or not raw:
                raise FilterError(f'{op} requires a non-empty array for "{field}"')
            values = [_validate_primitive(v) for v in raw]
            return (
                self.scalar_or_array_in(field, values)
                if op == "$in"
                else self.scalar_and_array_nin(field, values)
            )
        if op == "$exists":
            if not isinstance(raw, bool):
                raise FilterError(f'$exists requires a boolean for "{field}"')
            return self.exists(field, raw)
        raise FilterError(f"Unsupported field operator: {op}")

    def field_clause(self, field: str, value: Any) -> Column:
        if isinstance(value, dict):
            if not value:
                raise FilterError(f'Empty operator object for field "{field}"')
            for op in value:
                if op not in FIELD_OPERATORS:
                    raise FilterError(f"Unsupported field operator: {op}")
            out = None
            for op, raw in value.items():
                c = self.field_operator(field, op, raw)
                out = c if out is None else (out & c)
            return out
        return self.scalar_or_array_eq(field, _validate_primitive(value))

    def compile(self, ast: Any) -> Column:
        if not isinstance(ast, dict) or isinstance(ast, list):
            raise FilterError("Filter must be an object")
        keys = list(ast.keys())
        if not keys:
            raise FilterError("Filter must contain at least one clause")
        if "$and" in ast or "$or" in ast:
            if len(keys) != 1:
                raise FilterError(
                    f"Logical operator must be the only key, got: {', '.join(keys)}"
                )
            op = keys[0]
            sub = ast[op]
            if not isinstance(sub, list) or not sub:
                raise FilterError(f"{op} requires a non-empty array")
            parts = [self.compile(s) for s in sub]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if op == "$and" else (out | p)
            return out
        clauses = []
        for name in keys:
            if name.startswith("$"):
                raise FilterError(f'Unexpected operator "{name}" at field position')
            clauses.append(self.field_clause(name, ast[name]))
        out = clauses[0]
        for c in clauses[1:]:
            out = out & c
        return out


def validate_filterable_keys(ast: Any, non_filterable: set[str]) -> None:
    """F10: reject filters touching configured non-filterable keys
    (src/storage/protocols/vector/vector-store.ts:166-185)."""
    if not isinstance(ast, dict):
        return
    for k, v in ast.items():
        if k in ("$and", "$or"):
            if isinstance(v, list):
                for sub in v:
                    validate_filterable_keys(sub, non_filterable)
        elif not k.startswith("$"):
            if k in non_filterable:
                raise FilterError(f'Metadata key "{k}" is not filterable')


def compile_filter(
    ast: dict,
    metadata_col: Column | str = "metadata",
    non_filterable: set[str] | None = None,
) -> Column:
    """Compile a filter AST into one boolean Column over a JSON-string
    metadata column. Raises FilterError on grammar violations, exactly where
    the reference raises InvalidParameter."""
    if non_filterable:
        validate_filterable_keys(ast, non_filterable)
    col = F.col(metadata_col) if isinstance(metadata_col, str) else metadata_col
    return _Compiler(F.try_parse_json(col)).compile(ast)
