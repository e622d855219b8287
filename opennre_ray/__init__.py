"""opennre_ray — a Ray-Data-native knowledge-graph construction engine.

Brand-new implementation of the query/data-processing capabilities of the
reference relation-extraction toolkit (thunlp/OpenNRE, ``/root/reference``),
re-architected for Ray Data: Arrow-batch ``map_batches`` stages, actor pools
for model state, explicit groupby shuffles for bags / canonicalization /
dedup, and streaming execution end-to-end.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

from .registry import get_model, NREModel   # noqa: F401
from . import fixtures, tokenization, models, nn  # noqa: F401

__version__ = "0.1.0"
