"""Declarative transform operators.

Every operator is a function ``transform_<name>(df, spec, ctx) -> DataFrame``
dispatched from a per-dataset JSON spec by :mod:`.registry` — the same
user-facing contract as the reference's transform library
(``lib/glue_scripts/etl_collect_to_cleanse.py:271-291`` dispatch;
``lib/glue_scripts/transformation-spec/all-transforms-example.json`` grammar).

Modules re-exported here so ``registry`` can discover every transform.
"""

from .typeconversion import (  # noqa: F401
    transform_changetype,
    transform_currency,
    transform_date,
    transform_implieddecimal,
    transform_timestamp,
    transform_titlecase,
)
from .stringmanipulation import (  # noqa: F401
    transform_columnfromcolumn,
    transform_columnreplace,
    transform_combinecolumns,
    transform_filename,
    transform_literal,
)
from .misc import (  # noqa: F401
    transform_ewma,
    transform_filldown,
    transform_filterrows,
    transform_merge,
    transform_rownumber,
)
from .premium import (  # noqa: F401
    transform_addcolumns,
    transform_earnedpremium,
    transform_enddate,
    transform_expandpolicymonths,
    transform_flipsign,
    transform_multiplycolumns,
    transform_policymonths,
)
from .structureddata import (  # noqa: F401
    transform_flatten,
    transform_json,
    transform_jsonexpandarray,
    transform_jsonexpandmap,
    transform_jsonstructured,
    transform_xml,
    transform_xmlstructured,
)
from .dataprotection import (  # noqa: F401
    transform_dateshift,
    transform_hash,
    transform_piiredact,
    transform_redact,
    transform_tokenize,
)
from .lookup import (  # noqa: F401
    transform_lookup,
    transform_multilookup,
)
