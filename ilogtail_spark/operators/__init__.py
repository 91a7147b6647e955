"""Importing this package registers all processors (the analog of the
reference's generated plugin imports, plugins.yml:17-110)."""

from ilogtail_spark.operators import base as base  # noqa: F401
from ilogtail_spark.operators import regex as _regex  # noqa: F401
from ilogtail_spark.operators import filters as _filters  # noqa: F401
from ilogtail_spark.operators import transform as _transform  # noqa: F401
from ilogtail_spark.operators import grokop as _grokop  # noqa: F401
from ilogtail_spark.operators import jsonop as _jsonop  # noqa: F401
from ilogtail_spark.operators import splitop as _splitop  # noqa: F401
from ilogtail_spark.operators import timeops as _timeops  # noqa: F401
from ilogtail_spark.operators import enrich as _enrich  # noqa: F401
from ilogtail_spark.operators import reshape as _reshape  # noqa: F401
from ilogtail_spark.operators import extras as _extras  # noqa: F401
from ilogtail_spark.operators import spl as _spl  # noqa: F401
from ilogtail_spark.operators import prom as _prom  # noqa: F401

from ilogtail_spark.operators.base import PROCESSORS, build, register  # noqa: F401
