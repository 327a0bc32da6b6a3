"""microfts_ray: Ray-Data-native fulltext index + training-data engine.

Ray workers do not share the driver's sys.path, so functions defined
in this package are registered for pickle-by-value with Ray's
cloudpickle: batch closures ship their own code (and small referenced
globals) to workers instead of requiring the package to be importable
there. Heavy stages (the index build) additionally bootstrap sys.path
inside the task and import normally, so large module constants (e.g.
the 1-MiB codepoint table in functions/grams.py) are not serialized
per task.
"""

import sys as _sys

try:
    from ray import cloudpickle as _ray_cloudpickle

    _ray_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - ray not installed / API moved
    pass
