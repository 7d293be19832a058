"""Data-quality rule engine: a DQDL-subset compiler targeting Spark columns.

Re-expresses the reference's Glue Data Quality integration
(``lib/glue_scripts/lib/dataquality_check.py``; ruleset grammar per
``docs/data_quality.md:150-241`` and the shipped
``lib/glue_scripts/dq-rules/*.json``) as a self-contained rule compiler:

- Ruleset JSON: stages ``before_transform`` / ``after_transform`` /
  ``after_sparksql``, each with ``warn_rules`` / ``quarantine_rules`` /
  ``halt_rules``.
- **warn**: evaluate, record results, continue.
- **quarantine**: split pass/fail rows; failed rows gain a
  ``quarantine_timestamp`` and are written to
  ``<table>_quarantine_<stage>``; abort if *all* rows quarantined.
- **halt**: always evaluated last, on the **pre-quarantine** DataFrame
  (a quarantined row can still trip a halt rule); any failure raises.

Rule types: ``ColumnValues <col> matches '<re>' | <op> <val> | in [..] |
between a and b``, ``ColumnDataType <col> = '<TYPE>'``,
``Completeness <col> <op> <frac>``, ``IsComplete``, ``IsUnique``,
``IsPrimaryKey``, ``ColumnExists``, ``RowCount <op> <n>``,
``Uniqueness <col> <op> <frac>``, ``Mean``/``StandardDeviation``/``Sum``/
``DistinctValuesCount``/``ColumnCorrelation <a> <b>`` threshold rules,
``ColumnLength``, ``DataFreshness <col> <= N minutes|hours|days``
(injectable ``freshness_now`` for deterministic replay),
``ReferentialIntegrity``, composite ``(A) and (B)`` / ``(A) or (B)``, and
``CustomSql '<sql>'`` in aggregate (scalar comparison) and row-level
(key-set semi-join) forms; the incoming dataset is always aliased
``primary``, and ``UniqueValueRatio <col> <op> <frac>`` (exactly-once /
distinct values — its per-value frequencies need their own two-stage
aggregation job, compiled to a ``dataset_eval`` hook).

Execution design (scale): every non-CustomSql rule compiles to either a
row-level boolean ``Column`` or an aggregate expression; *all* aggregate
expressions for a stage are evaluated in ONE ``df.agg(...)`` job (single
pass, map-side partial aggregation).  Row-level quarantine is a single
``filter`` each way — no per-rule jobs, no driver loops over rows.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QUOTED = r"(?:'([^']*)'|\"([^\"]*)\")"
_OPS = {">": "__gt__", ">=": "__ge__", "<": "__lt__", "<=": "__le__", "=": "__eq__", "!=": "__ne__"}


def _pick(match_groups: tuple) -> str:
    return next(g for g in match_groups if g is not None)


def _literal(token: str) -> Any:
    token = token.strip()
    if token.startswith(("'", '"')):
        return token[1:-1]
    if re.fullmatch(r"[+-]?\d+", token):
        return int(token)
    if re.fullmatch(r"[+-]?\d*\.\d+([eE][+-]?\d+)?", token):
        return float(token)
    return token


@dataclass
class CompiledRule:
    """One rule compiled against a concrete DataFrame."""

    text: str
    #: row-level pass predicate (None for aggregate-only rules)
    predicate: Column | None = None
    #: aggregate pass expression(s): named Columns folded into the stage agg
    agg_exprs: dict[str, Column] = field(default_factory=dict)
    #: decide pass/fail from the agg row; default = predicate has no failures
    agg_eval: Callable[[dict], bool] | None = None
    #: schema-level outcome decided at compile time (ColumnExists)
    static_result: bool | None = None
    #: deferred CustomSql evaluation (needs spark.sql)
    custom_sql: str | None = None
    custom_sql_compare: tuple[str, Any, Any] | None = None  # (op, value, value2)
    #: ReferentialIntegrity: (fact column, distinct reference-key DataFrame,
    #: reference key column name, optional (op, ratio) aggregate threshold)
    ri_col: str | None = None
    ri_keys: Any = None
    ri_ref_col: str | None = None
    ri_compare: tuple[str, float] | None = None
    #: DatasetMatch: (reference DataFrame, key columns, (op, ratio))
    dm_ref: Any = None
    dm_keys: list | None = None
    dm_compare: tuple[str, float] | None = None
    #: generic two-pass evaluation: callable(df) -> RuleOutcome, for
    #: statistics that need their own grouped sub-aggregation and cannot
    #: fold into the stage's single shared ``df.agg`` (UniqueValueRatio)
    dataset_eval: Callable[[DataFrame], "RuleOutcome"] | None = None


@dataclass
class RuleOutcome:
    rule: str
    passed: bool
    observed: Any = None


class DQRuleError(RuntimeError):
    pass


def _fail_count_name(index: int) -> str:
    return f"__dq_fail_{index}"


class RuleCompiler:
    """Compile one rule string against a DataFrame's schema."""

    def __init__(self, df: DataFrame, ref_resolver=None):
        self.df = df
        self.columns = set(df.columns)
        #: table-name -> DataFrame, for multi-table rules
        #: (ReferentialIntegrity).  Defaults to the session catalog.
        self.ref_resolver = ref_resolver or (
            lambda name: df.sparkSession.table(name)
        )

    # -- public ----------------------------------------------------------
    def compile(self, rule_text: str) -> CompiledRule:
        rule_text = rule_text.strip()
        if rule_text.startswith("("):
            return self._compile_composite(rule_text)
        return self._compile_single(rule_text)

    # -- composite (A) and (B) -------------------------------------------
    def _split_composite(self, text: str) -> tuple[list[str], list[str]]:
        parts: list[str] = []
        joiners: list[str] = []
        depth = 0
        current = ""
        i = 0
        while i < len(text):
            ch = text[i]
            if ch == "(":
                depth += 1
                if depth == 1:
                    i += 1
                    continue
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    parts.append(current.strip())
                    current = ""
                    rest = text[i + 1 :].lstrip()
                    joiner_match = re.match(r"(and|or)\b", rest, re.IGNORECASE)
                    if joiner_match:
                        joiners.append(joiner_match.group(1).lower())
                        i = text.index(rest, i + 1) + joiner_match.end()
                        continue
                    i += 1
                    continue
            if depth >= 1:
                current += ch
            i += 1
        return parts, joiners

    def _compile_composite(self, text: str) -> CompiledRule:
        parts, joiners = self._split_composite(text)
        if not parts:
            raise DQRuleError(f"Unparseable composite rule: {text}")
        compiled = [self._compile_single(p) for p in parts]
        out = CompiledRule(text=text)
        predicate: Column | None = None
        for index, sub in enumerate(compiled):
            out.agg_exprs.update(sub.agg_exprs)
            sub_pred = sub.predicate
            if sub_pred is None and sub.static_result is not None:
                sub_pred = F.lit(sub.static_result)
            if predicate is None:
                predicate = sub_pred
            elif sub_pred is not None:
                joiner = joiners[index - 1] if index - 1 < len(joiners) else "and"
                predicate = (predicate | sub_pred) if joiner == "or" else (predicate & sub_pred)
        out.predicate = predicate
        statics = [s.static_result for s in compiled if s.static_result is not None]
        evals = [s.agg_eval for s in compiled if s.agg_eval is not None]
        if statics or evals:
            def _eval(agg_row: dict, statics=statics, evals=evals, joiners=joiners) -> bool:
                results = list(statics) + [e(agg_row) for e in evals]
                combined = results[0]
                for j, value in zip(joiners, results[1:]):
                    combined = (combined or value) if j == "or" else (combined and value)
                return combined

            out.agg_eval = _eval
        if any(s.custom_sql for s in compiled):
            raise DQRuleError("CustomSql cannot appear inside a composite rule")
        joined = [s for s in compiled
                  if s.ri_keys is not None or s.dm_ref is not None
                  or s.dataset_eval is not None]
        if joined:
            # these evaluate via their own join/sub-aggregation, which the
            # composite combiner cannot fold — dropping them would
            # FALSE-PASS the composite (review finding r6)
            raise DQRuleError(
                "ReferentialIntegrity/DatasetMatch/UniqueValueRatio cannot "
                f"appear inside a composite rule (found in: {joined[0].text!r})"
            )
        return out

    # -- single rules -----------------------------------------------------
    def _compile_single(self, text: str) -> CompiledRule:
        head_match = re.match(r"(\w+)\s*(.*)$", text, re.DOTALL)
        if not head_match:
            raise DQRuleError(f"Unparseable rule: {text}")
        head, rest = head_match.group(1), head_match.group(2).strip()
        handler = getattr(self, f"_rule_{head.lower()}", None)
        if handler is None:
            raise DQRuleError(f"Unsupported rule type: {head}")
        return handler(text, rest)

    def _column(self, token: str) -> str:
        name = _literal(token) if token.startswith(("'", '"')) else token
        return str(name)

    def _require_column(self, name: str, rule: str) -> None:
        if name not in self.columns:
            raise DQRuleError(f"Column '{name}' not found (rule: {rule})")

    def _rule_columnvalues(self, text: str, rest: str) -> CompiledRule:
        col_match = re.match(rf"{_QUOTED}\s+(.*)$", rest, re.DOTALL) or re.match(
            r"(\S+)\s+(.*)$", rest, re.DOTALL
        )
        if not col_match:
            raise DQRuleError(f"Unparseable ColumnValues rule: {text}")
        groups = col_match.groups()
        name = self._column(f"'{_pick(groups[:-1])}'" if len(groups) > 2 else groups[0])
        condition = groups[-1].strip()
        self._require_column(name, text)
        column = F.col(f"`{name}`")

        matches = re.fullmatch(rf"matches\s+{_QUOTED}", condition, re.DOTALL)
        if matches:
            predicate = column.cast("string").rlike(_pick(matches.groups()))
            return self._predicate_rule(text, predicate)

        in_list = re.fullmatch(r"in\s*\[(.*)\]", condition, re.DOTALL)
        if in_list:
            return self._predicate_rule(text, column.isin(self._relist(in_list.group(1))))

        between = re.fullmatch(r"between\s+(\S+)\s+and\s+(\S+)", condition)
        if between:
            low, high = _literal(between.group(1)), _literal(between.group(2))
            return self._predicate_rule(text, (column > low) & (column < high))

        op_match = re.fullmatch(rf"(>=|<=|!=|=|>|<)\s+({_QUOTED}|\S+)", condition)
        if op_match:
            value = _literal(op_match.group(2))
            predicate = getattr(column, _OPS[op_match.group(1)])(F.lit(value))
            return self._predicate_rule(text, predicate)
        raise DQRuleError(f"Unparseable ColumnValues condition: {condition}")

    @staticmethod
    def _relist(body: str) -> list[Any]:
        values: list[Any] = []
        for match in re.finditer(rf"{_QUOTED}|([^,\s\[\]]+)", body):
            if match.group(1) is not None:
                values.append(match.group(1))
            elif match.group(2) is not None:
                values.append(match.group(2))
            elif match.group(3):
                values.append(_literal(match.group(3)))
        return values

    def _predicate_rule(self, text: str, predicate: Column) -> CompiledRule:
        """ColumnValues-style rule: nulls count as non-compliant."""
        safe = F.coalesce(predicate.cast("boolean"), F.lit(False))
        index = abs(hash(text)) % (10**9)
        name = _fail_count_name(index)
        rule = CompiledRule(text=text, predicate=safe)
        rule.agg_exprs[name] = F.sum(F.when(~safe, 1).otherwise(0))
        rule.agg_eval = lambda agg_row, name=name: (agg_row.get(name) or 0) == 0
        return rule

    def _rule_columndatatype(self, text: str, rest: str) -> CompiledRule:
        match = re.fullmatch(rf"{_QUOTED}\s*=\s*{_QUOTED}", rest) or re.fullmatch(
            rf"(\S+)\s*=\s*{_QUOTED}", rest
        )
        if not match:
            raise DQRuleError(f"Unparseable ColumnDataType rule: {text}")
        groups = match.groups()
        name = self._column(f"'{_pick(groups[:2])}'") if len(groups) > 3 else self._column(groups[0])
        wanted = _pick(groups[-2:]).upper()
        self._require_column(name, text)
        column = F.col(f"`{name}`")
        actual = self.df.schema[name].dataType.simpleString().upper()
        if actual == wanted or (wanted == "DATE" and actual == "DATE") or (
            wanted == "TIMESTAMP" and actual.startswith("TIMESTAMP")
        ):
            # Already that type — every row complies.
            predicate = F.lit(True)
        elif wanted == "DATE":
            predicate = (
                column.isNull()
                | column.cast("string").try_cast("date").isNotNull()
                | F.try_to_timestamp(column.cast("string")).isNotNull()
            )
        elif wanted == "TIMESTAMP":
            predicate = column.isNull() | F.try_to_timestamp(column.cast("string")).isNotNull()
        else:
            predicate = column.isNull() | column.cast("string").try_cast(wanted.lower()).isNotNull()
        # Null values cannot violate a type expectation → count as compliant.
        rule = CompiledRule(text=text, predicate=F.coalesce(predicate, F.lit(True)))
        index = abs(hash(text)) % (10**9)
        name_key = _fail_count_name(index)
        rule.agg_exprs[name_key] = F.sum(F.when(~rule.predicate, 1).otherwise(0))
        rule.agg_eval = lambda agg_row, name_key=name_key: (agg_row.get(name_key) or 0) == 0
        return rule

    def _rule_completeness(self, text: str, rest: str) -> CompiledRule:
        match = re.fullmatch(rf"(?:{_QUOTED}|(\S+))\s*(>=|<=|!=|=|>|<)\s*([\d.]+)", rest)
        if not match:
            raise DQRuleError(f"Unparseable Completeness rule: {text}")
        name = self._column(f"'{_pick(match.groups()[:3])}'")
        op, threshold = match.group(4), float(match.group(5))
        self._require_column(name, text)
        key = f"__dq_complete_{abs(hash(text)) % (10**9)}"
        rule = CompiledRule(text=text)
        rule.agg_exprs[key] = (
            F.count(F.col(f"`{name}`")) / F.greatest(F.count(F.lit(1)), F.lit(1))
        ).cast("double")
        py_ops = {">": "__gt__", ">=": "__ge__", "<": "__lt__", "<=": "__le__",
                  "=": "__eq__", "!=": "__ne__"}
        rule.agg_eval = lambda agg_row, key=key, op=op, threshold=threshold: getattr(
            float(agg_row.get(key) or 0.0), py_ops[op]
        )(threshold)
        return rule

    def _rule_iscomplete(self, text: str, rest: str) -> CompiledRule:
        name = self._column(rest.strip())
        self._require_column(name, text)
        predicate = F.col(f"`{name}`").isNotNull()
        return self._predicate_rule(text, predicate)

    def _rule_columnexists(self, text: str, rest: str) -> CompiledRule:
        name = self._column(rest.strip())
        return CompiledRule(text=text, static_result=name in self.columns)

    def _rule_referentialintegrity(self, text: str, rest: str) -> CompiledRule:
        """``ReferentialIntegrity 'col' 'ref_table.ref_col' [<op> <ratio>]``
        — every fact key must exist in the reference table (or at least
        the given fraction, aggregate mode).  The reference resolves via
        ``ref_resolver``; the runner evaluates membership with ONE
        broadcast left join against the DISTINCT reference keys — a
        dimension-key set, small by construction relative to the fact —
        so the fact side is never shuffled (Glue DQDL parity: the
        reference engine's DQDL supports the same rule)."""
        match = re.fullmatch(
            rf"{_QUOTED}\s+{_QUOTED}\s*(?:(>=|<=|!=|=|>|<)\s*([\d.]+))?",
            rest,
            re.DOTALL,
        )
        if not match:
            raise DQRuleError(f"Unparseable ReferentialIntegrity rule: {text}")
        groups = match.groups()
        col = _pick(groups[0:2])
        ref_spec = _pick(groups[2:4])
        self._require_column(col, text)
        if "." not in ref_spec:
            raise DQRuleError(
                f"ReferentialIntegrity reference must be 'table.column': {text}"
            )
        ref_table, ref_col = ref_spec.rsplit(".", 1)
        try:
            ref_df = self.ref_resolver(ref_table)
        except Exception as exc:  # noqa: BLE001 - surface as rule error
            raise DQRuleError(
                f"Cannot resolve reference table '{ref_table}' (rule: {text})"
            ) from exc
        if ref_col not in ref_df.columns:
            raise DQRuleError(
                f"Column '{ref_col}' not found in reference '{ref_table}' (rule: {text})"
            )
        rule = CompiledRule(text=text)
        rule.ri_col = col
        rule.ri_ref_col = ref_col
        # NULL reference keys are dropped so a NULL fact key can never
        # null-safely "resolve" against a NULL in the reference set —
        # unresolvable rows must always count as violations (Glue DQDL
        # semantics), regardless of reference-table data quality.
        rule.ri_keys = (
            ref_df.select(F.col(f"`{ref_col}`"))
            .where(F.col(f"`{ref_col}`").isNotNull())
            .distinct()
        )
        if groups[4] is not None:
            rule.ri_compare = (groups[4], float(groups[5]))
        return rule

    def _rule_rowcount(self, text: str, rest: str) -> CompiledRule:
        match = re.fullmatch(r"(>=|<=|!=|=|>|<)\s*(\d+)", rest)
        if not match:
            raise DQRuleError(f"Unparseable RowCount rule: {text}")
        op, value = match.group(1), int(match.group(2))
        key = f"__dq_rowcount_{abs(hash(text)) % (10**9)}"
        rule = CompiledRule(text=text)
        rule.agg_exprs[key] = F.count(F.lit(1))
        py_ops = {">": "__gt__", ">=": "__ge__", "<": "__lt__", "<=": "__le__",
                  "=": "__eq__", "!=": "__ne__"}
        rule.agg_eval = lambda agg_row, key=key: getattr(int(agg_row.get(key) or 0), py_ops[op])(value)
        return rule

    def _rule_uniqueness(self, text: str, rest: str) -> CompiledRule:
        match = re.fullmatch(rf"(?:{_QUOTED}|(\S+))\s*(>=|<=|!=|=|>|<)\s*([\d.]+)", rest)
        if not match:
            raise DQRuleError(f"Unparseable Uniqueness rule: {text}")
        name = self._column(f"'{_pick(match.groups()[:3])}'")
        op, threshold = match.group(4), float(match.group(5))
        self._require_column(name, text)
        key = f"__dq_unique_{abs(hash(text)) % (10**9)}"
        rule = CompiledRule(text=text)
        rule.agg_exprs[key] = (
            F.count_distinct(F.col(f"`{name}`")) / F.greatest(F.count(F.col(f"`{name}`")), F.lit(1))
        ).cast("double")
        py_ops = {">": "__gt__", ">=": "__ge__", "<": "__lt__", "<=": "__le__",
                  "=": "__eq__", "!=": "__ne__"}
        rule.agg_eval = lambda agg_row, key=key: getattr(
            float(agg_row.get(key) or 0.0), py_ops[op]
        )(threshold)
        return rule

    def _rule_isunique(self, text: str, rest: str) -> CompiledRule:
        name = self._column(rest.strip())
        self._require_column(name, text)
        key = f"__dq_isuniq_{abs(hash(text)) % (10**9)}"
        rule = CompiledRule(text=text)
        rule.agg_exprs[key] = (
            F.count_distinct(F.col(f"`{name}`")) - F.count(F.col(f"`{name}`"))
        )
        rule.agg_eval = lambda agg_row, key=key: int(agg_row.get(key) or 0) == 0
        return rule

    # -- statistical aggregate rules (Glue DQDL surface beyond what the
    # reference's own configs exercise: Mean, StandardDeviation, Sum,
    # DistinctValuesCount, ColumnLength) ---------------------------------
    def _parse_col_and_condition(self, text: str, rest: str) -> tuple[str, str]:
        match = re.match(rf"(?:{_QUOTED}|(\S+))\s+(.*)$", rest, re.DOTALL)
        if not match:
            raise DQRuleError(f"Unparseable rule: {text}")
        name = self._column(f"'{_pick(match.groups()[:3])}'")
        self._require_column(name, text)
        return name, match.group(4).strip()

    def _agg_compare_rule(
        self, text: str, condition: str, key_prefix: str, agg_expr: Column
    ) -> CompiledRule:
        """Aggregate-threshold rule: ``<op> <num>`` or exclusive
        ``between a and b`` (the CustomSql comparator's convention) over a
        single scalar computed in the shared stage aggregation pass."""
        key = f"__dq_{key_prefix}_{abs(hash(text)) % (10**9)}"
        rule = CompiledRule(text=text)
        rule.agg_exprs[key] = agg_expr
        between = re.fullmatch(
            r"between\s+(-?[\d.]+)\s+and\s+(-?[\d.]+)", condition, re.IGNORECASE
        )
        single = re.fullmatch(r"(>=|<=|!=|=|>|<)\s*(-?[\d.]+)", condition)
        if between:
            lo, hi = float(between.group(1)), float(between.group(2))
            rule.agg_eval = lambda agg_row, key=key, lo=lo, hi=hi: (
                agg_row.get(key) is not None and lo < float(agg_row[key]) < hi
            )
        elif single:
            op, value = single.group(1), float(single.group(2))
            py_ops = {">": "__gt__", ">=": "__ge__", "<": "__lt__", "<=": "__le__",
                      "=": "__eq__", "!=": "__ne__"}
            rule.agg_eval = lambda agg_row, key=key, op=op, value=value: (
                agg_row.get(key) is not None
                and getattr(float(agg_row[key]), py_ops[op])(value)
            )
        else:
            raise DQRuleError(f"Unparseable threshold condition: {text}")
        return rule

    def _rule_mean(self, text: str, rest: str) -> CompiledRule:
        name, condition = self._parse_col_and_condition(text, rest)
        return self._agg_compare_rule(
            text, condition, "mean", F.avg(F.col(f"`{name}`")).cast("double")
        )

    def _rule_standarddeviation(self, text: str, rest: str) -> CompiledRule:
        """Population standard deviation (Deequ's StandardDeviation
        semantics, which Glue DQDL inherits)."""
        name, condition = self._parse_col_and_condition(text, rest)
        return self._agg_compare_rule(
            text, condition, "stddev", F.stddev_pop(F.col(f"`{name}`")).cast("double")
        )

    def _rule_sum(self, text: str, rest: str) -> CompiledRule:
        name, condition = self._parse_col_and_condition(text, rest)
        return self._agg_compare_rule(
            text, condition, "sum", F.sum(F.col(f"`{name}`")).cast("double")
        )

    def _rule_distinctvaluescount(self, text: str, rest: str) -> CompiledRule:
        name, condition = self._parse_col_and_condition(text, rest)
        return self._agg_compare_rule(
            text, condition, "dvc",
            F.count_distinct(F.col(f"`{name}`")).cast("double"),
        )

    def _rule_columnlength(self, text: str, rest: str) -> CompiledRule:
        """Row-level string-length rule (``length(col) <op> n`` /
        exclusive ``between a and b``); nulls are non-compliant, matching
        the ColumnValues convention."""
        name, condition = self._parse_col_and_condition(text, rest)
        length = F.length(F.col(f"`{name}`").cast("string"))
        between = re.fullmatch(
            r"between\s+(\d+)\s+and\s+(\d+)", condition, re.IGNORECASE
        )
        single = re.fullmatch(r"(>=|<=|!=|=|>|<)\s*(\d+)", condition)
        if between:
            lo, hi = int(between.group(1)), int(between.group(2))
            predicate = (length > lo) & (length < hi)
        elif single:
            op, value = single.group(1), int(single.group(2))
            spark_ops = {">": length > value, ">=": length >= value,
                         "<": length < value, "<=": length <= value,
                         "=": length == value, "!=": length != value}
            predicate = spark_ops[op]
        else:
            raise DQRuleError(f"Unparseable ColumnLength condition: {text}")
        return self._predicate_rule(text, predicate)

    def _rule_isprimarykey(self, text: str, rest: str) -> CompiledRule:
        """``IsPrimaryKey <col>`` = complete AND unique (Glue DQDL):
        zero nulls and zero duplicate values, both from the one shared
        aggregation pass."""
        name = self._column(rest.strip())
        self._require_column(name, text)
        key_n = f"__dq_pk_nulls_{abs(hash(text)) % (10**9)}"
        key_d = f"__dq_pk_dups_{abs(hash(text)) % (10**9)}"
        col = F.col(f"`{name}`")
        rule = CompiledRule(text=text)
        rule.agg_exprs[key_n] = F.count(F.when(col.isNull(), 1))
        rule.agg_exprs[key_d] = F.count_distinct(col) - F.count(col)
        rule.agg_eval = lambda agg_row, kn=key_n, kd=key_d: (
            int(agg_row.get(kn) or 0) == 0 and int(agg_row.get(kd) or 0) == 0
        )
        return rule

    def _rule_uniquevalueratio(self, text: str, rest: str) -> CompiledRule:
        """``UniqueValueRatio <col> <op> <frac>`` — (values appearing
        exactly once) / (distinct values), per Glue DQDL (NOT the same
        statistic as Uniqueness = distinct/count).  Needs per-value
        frequencies, so it cannot fold into the stage's single shared
        ``df.agg`` pass; compiled to a ``dataset_eval`` hook that runs
        one two-stage aggregation job (groupBy(col).count() then a
        scalar agg — map-side partial both stages, result is one row).
        Nulls are excluded from the value universe, matching the
        Uniqueness rule's ``count(col)`` convention; an all-null or
        empty column passes vacuously (ratio 1.0)."""
        match = re.fullmatch(
            rf"(?:{_QUOTED}|(\S+))\s*(>=|<=|!=|=|>|<)\s*([\d.]+)", rest
        )
        between = None
        if not match:
            between = re.fullmatch(
                rf"(?:{_QUOTED}|(\S+))\s+between\s+([\d.]+)\s+and\s+([\d.]+)",
                rest, re.IGNORECASE,
            )
            if not between:
                raise DQRuleError(f"Unparseable UniqueValueRatio rule: {text}")
        groups = (match or between).groups()
        name = self._column(f"'{_pick(groups[:3])}'")
        self._require_column(name, text)
        col = F.col(f"`{name}`")
        if match:
            op, threshold = match.group(4), float(match.group(5))
            def decide(ratio: float, op=op, threshold=threshold) -> bool:
                return getattr(ratio, _OPS[op])(threshold)
        else:
            lo, hi = float(between.group(4)), float(between.group(5))
            def decide(ratio: float, lo=lo, hi=hi) -> bool:
                # exclusive bounds: the CustomSql comparator's convention
                return lo < ratio < hi

        def evaluate(df: DataFrame, col=col, text=text) -> RuleOutcome:
            freq = (
                df.where(col.isNotNull())
                .groupBy(col.alias("__dq_uvr_value"))
                .agg(F.count(F.lit(1)).alias("__dq_uvr_freq"))
            )
            row = freq.agg(
                F.count(F.when(F.col("__dq_uvr_freq") == 1, 1)).alias("u"),
                F.count(F.lit(1)).alias("d"),
            ).collect()[0]
            unique_once, distinct = int(row["u"] or 0), int(row["d"] or 0)
            ratio = (unique_once / distinct) if distinct else 1.0
            return RuleOutcome(
                text, bool(decide(ratio)),
                {"unique_values": unique_once, "distinct_values": distinct,
                 "ratio": ratio},
            )

        rule = CompiledRule(text=text)
        rule.dataset_eval = evaluate
        return rule

    def _rule_columncorrelation(self, text: str, rest: str) -> CompiledRule:
        """``ColumnCorrelation <a> <b> <op> <v>`` — Pearson correlation
        between two numeric columns as one ``corr`` aggregate in the
        shared pass (Glue DQDL rule type)."""
        match = re.match(
            rf"(?:{_QUOTED}|(\S+))\s+(?:{_QUOTED}|(\S+))\s+(.*)$",
            rest, re.DOTALL,
        )
        if not match:
            raise DQRuleError(f"Unparseable ColumnCorrelation rule: {text}")
        groups = match.groups()
        a = self._column(f"'{_pick(groups[0:3])}'")
        b = self._column(f"'{_pick(groups[3:6])}'")
        condition = (groups[6] or "").strip()
        self._require_column(a, text)
        self._require_column(b, text)
        return self._agg_compare_rule(
            text, condition, "corr",
            F.corr(F.col(f"`{a}`"), F.col(f"`{b}`")).cast("double"),
        )

    def _rule_datafreshness(self, text: str, rest: str) -> CompiledRule:
        """``DataFreshness <col> <= N hours|days`` — every value must be
        within the window ending at ``now`` (Glue DQDL).  ``now`` is
        injectable via the compiler's ``freshness_now`` attribute so
        tests and replays are deterministic; nulls are non-compliant,
        matching the ColumnValues convention."""
        name, condition = self._parse_col_and_condition(text, rest)
        match = re.fullmatch(
            r"(<=|<)\s*(\d+)\s+(hours?|days?|minutes?)", condition,
            re.IGNORECASE,
        )
        if not match:
            raise DQRuleError(f"Unparseable DataFreshness condition: {text}")
        amount = int(match.group(2))
        unit = match.group(3).lower().rstrip("s")
        seconds = amount * {"minute": 60, "hour": 3600, "day": 86400}[unit]
        now = getattr(self, "freshness_now", None)
        now_col = F.lit(now).cast("timestamp") if now is not None else (
            F.current_timestamp()
        )
        age = now_col.cast("long") - F.col(f"`{name}`").cast("timestamp").cast("long")
        predicate = (age >= 0) & (
            (age <= seconds) if match.group(1) == "<=" else (age < seconds)
        )
        return self._predicate_rule(text, predicate)

    def _rule_customsql(self, text: str, rest: str) -> CompiledRule:
        match = re.match(rf"{_QUOTED}\s*(.*)$", rest, re.DOTALL)
        if not match:
            raise DQRuleError(f"Unparseable CustomSql rule: {text}")
        sql = _pick(match.groups()[:2])
        condition = (match.group(3) or "").strip()
        rule = CompiledRule(text=text, custom_sql=sql)
        if condition:
            between = re.fullmatch(r"between\s+(\S+)\s+and\s+(\S+)", condition)
            if between:
                rule.custom_sql_compare = (
                    "between", _literal(between.group(1)), _literal(between.group(2))
                )
            else:
                op_match = re.fullmatch(rf"(>=|<=|!=|=|>|<)\s+({_QUOTED}|\S+)", condition)
                if not op_match:
                    raise DQRuleError(f"Unparseable CustomSql condition: {condition}")
                rule.custom_sql_compare = (op_match.group(1), _literal(op_match.group(2)), None)
        return rule

    # -- dataset/reference match rules (Glue DQDL: ColumnCount,
    # ColumnNamesMatchPattern, RowCountMatch, AggregateMatch,
    # DatasetMatch) --------------------------------------------------

    def _rule_columncount(self, text: str, rest: str) -> CompiledRule:
        """``ColumnCount <op> <n>`` — schema-level, decided at compile."""
        match = re.fullmatch(r"(>=|<=|!=|=|>|<)\s*(\d+)", rest)
        if not match:
            raise DQRuleError(f"Unparseable ColumnCount rule: {text}")
        op, n = match.group(1), int(match.group(2))
        passed = getattr(len(self.df.columns), _OPS[op])(n)
        return CompiledRule(text=text, static_result=bool(passed))

    def _rule_columnnamesmatchpattern(self, text: str, rest: str) -> CompiledRule:
        """``ColumnNamesMatchPattern 'regex'`` — every column name must
        fully match; schema-level, decided at compile."""
        match = re.fullmatch(rf"{_QUOTED}", rest, re.DOTALL)
        if not match:
            raise DQRuleError(f"Unparseable ColumnNamesMatchPattern rule: {text}")
        pattern = _pick(match.groups())
        try:
            compiled = re.compile(pattern)
        except re.error as exc:
            raise DQRuleError(
                f"Invalid ColumnNamesMatchPattern regex {pattern!r}: {exc}"
            ) from exc
        passed = all(compiled.fullmatch(c) for c in self.df.columns)
        return CompiledRule(text=text, static_result=bool(passed))

    def _resolve_ref(self, name: str, text: str):
        try:
            return self.ref_resolver(name)
        except Exception as exc:  # noqa: BLE001 - surface as rule error
            raise DQRuleError(
                f"Cannot resolve reference dataset '{name}' (rule: {text})"
            ) from exc

    def _rule_rowcountmatch(self, text: str, rest: str) -> CompiledRule:
        """``RowCountMatch 'reference' <op> <ratio>`` — primary row count
        over reference row count.  The primary count folds into the
        shared stage aggregation; the reference count is one lazy action
        at evaluation time (same cost class as CustomSql)."""
        match = re.fullmatch(rf"{_QUOTED}\s*(>=|<=|!=|=|>|<)\s*(\d+(?:\.\d+)?)", rest)
        if not match:
            raise DQRuleError(f"Unparseable RowCountMatch rule: {text}")
        ref_name = _pick(match.groups()[:2])
        op, ratio = match.group(3), float(match.group(4))
        ref_df = self._resolve_ref(ref_name, text)
        key = f"__dq_rcmatch_{abs(hash(text)) % (10**9)}"
        rule = CompiledRule(text=text)
        rule.agg_exprs[key] = F.count(F.lit(1))

        def evaluate(agg_row, key=key, op=op, ratio=ratio, ref_df=ref_df):
            ref_n = ref_df.count()
            got = int(agg_row.get(key) or 0) / max(ref_n, 1)
            return getattr(got, _OPS[op])(ratio)

        rule.agg_eval = evaluate
        return rule

    _AGG_FNS = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
                "count": F.count}

    def _parse_agg_spec(self, spec: str, text: str):
        m = re.fullmatch(r"(sum|avg|min|max|count)\s*\(\s*([\w.]+)\s*\)",
                         spec.strip(), re.IGNORECASE)
        if not m:
            raise DQRuleError(f"Unparseable aggregate '{spec}' (rule: {text})")
        return m.group(1).lower(), m.group(2)

    def _rule_aggregatematch(self, text: str, rest: str) -> CompiledRule:
        """``AggregateMatch 'sum(col)' 'sum(reference.col)' <op> <ratio>``
        — the primary aggregate folds into the stage aggregation; the
        reference aggregate is one lazy scalar action at evaluation."""
        match = re.fullmatch(
            rf"{_QUOTED}\s+{_QUOTED}\s*(>=|<=|!=|=|>|<)\s*(\d+(?:\.\d+)?)", rest,
            re.DOTALL,
        )
        if not match:
            raise DQRuleError(f"Unparseable AggregateMatch rule: {text}")
        groups = match.groups()
        fn, col = self._parse_agg_spec(_pick(groups[0:2]), text)
        self._require_column(col, text)
        ref_fn, ref_spec = self._parse_agg_spec(_pick(groups[2:4]), text)
        if "." not in ref_spec:
            raise DQRuleError(
                f"AggregateMatch reference must be 'table.column': {text}"
            )
        ref_name, ref_col = ref_spec.rsplit(".", 1)
        ref_df = self._resolve_ref(ref_name, text)
        if ref_col not in ref_df.columns:
            raise DQRuleError(
                f"Column '{ref_col}' not found in reference '{ref_name}' (rule: {text})"
            )
        op, ratio = match.group(5), float(match.group(6))
        key = f"__dq_aggmatch_{abs(hash(text)) % (10**9)}"
        rule = CompiledRule(text=text)
        rule.agg_exprs[key] = self._AGG_FNS[fn](F.col(f"`{col}`")).cast("double")

        def evaluate(agg_row, key=key, op=op, ratio=ratio,
                     ref_df=ref_df, ref_fn=ref_fn, ref_col=ref_col):
            ref_val = ref_df.agg(
                self._AGG_FNS[ref_fn](F.col(f"`{ref_col}`")).cast("double")
            ).collect()[0][0]
            mine = agg_row.get(key)
            if mine is None or ref_val is None:
                return False
            mine, ref_val = float(mine), float(ref_val)
            if ref_val == 0.0:
                # 0/0 agrees perfectly; x/0 diverges infinitely — let the
                # operator decide instead of hard-failing (a '!=' rule
                # against a balanced ledger is legitimate)
                got = 1.0 if mine == 0.0 else float("inf")
            else:
                got = mine / ref_val
            return getattr(got, _OPS[op])(ratio)

        rule.agg_eval = evaluate
        return rule

    def _rule_datasetmatch(self, text: str, rest: str) -> CompiledRule:
        """``DatasetMatch 'reference' 'key1[,key2]' [<op> <ratio>]`` —
        fraction of primary rows whose key exists in the reference AND
        whose shared non-key columns are equal there (Glue semantics).
        Runner evaluates with one join keyed on the key columns."""
        match = re.fullmatch(
            rf"{_QUOTED}\s+{_QUOTED}\s*(?:(>=|<=|!=|=|>|<)\s*(\d+(?:\.\d+)?))?",
            rest, re.DOTALL,
        )
        if not match:
            raise DQRuleError(f"Unparseable DatasetMatch rule: {text}")
        groups = match.groups()
        ref_name = _pick(groups[0:2])
        keys = [k.strip() for k in _pick(groups[2:4]).split(",") if k.strip()]
        if not keys:
            raise DQRuleError(f"DatasetMatch needs at least one key column: {text}")
        ref_df = self._resolve_ref(ref_name, text)
        for k in keys:
            self._require_column(k, text)
            if k not in ref_df.columns:
                raise DQRuleError(
                    f"Key '{k}' not found in reference '{ref_name}' (rule: {text})"
                )
        rule = CompiledRule(text=text)
        rule.dm_ref = ref_df
        rule.dm_keys = keys
        if groups[4] is not None:
            rule.dm_compare = (groups[4], float(groups[5]))
        return rule
