"""Auto-imported at Python startup when this dir leads PYTHONPATH:
gives Spark PYTHON WORKERS the vendored google.protobuf (see
bigquery_etl_spark/_vendor.py — the driver cannot edit a worker's
sys.path after the fact, so the shim must ride interpreter startup)."""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"

try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
        sys.path.append(_GAE)

try:
    from google.protobuf import runtime_version as _rv

    if not getattr(_rv, "_bqes_relaxed", False):
        _orig = _rv.ValidateProtobufRuntimeVersion

        def _lenient(gd, gmaj, gmin, gpat, gsuf, loc):
            try:
                _orig(gd, gmaj, gmin, gpat, gsuf, loc)
            except _rv.VersionError:
                if not (gmaj == _rv.MAJOR and _rv.MINOR >= gmin - 1):
                    raise

        _rv.ValidateProtobufRuntimeVersion = _lenient
        _rv._bqes_relaxed = True
except Exception:  # noqa: BLE001 — shim must never break startup
    pass
