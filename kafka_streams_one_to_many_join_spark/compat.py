"""Optional-dependency discovery — currently: a standalone protobuf runtime.

Spark 4's ``transformWithStateInPandas`` (the typed-state variant of the
reference's core operator, streaming/join_tws.py) speaks a protobuf-based
state-server protocol: the streaming Python "driver worker" imports
``pyspark.sql.streaming.proto.StateMessage_pb2`` at init and crashes the
query if ``google.protobuf`` is unimportable.

Some containers have no pip-installed protobuf but DO carry a standalone
copy of the public, BSD-licensed protobuf Python runtime vendored by another
commonly-installed tool (e.g. the Google Cloud SDK vendors one under
``platform/google_appengine``).  This module discovers such a copy:

1. ``google.protobuf`` already importable → nothing to do;
2. ``$SPARK_GRAFT_PROTOBUF_DIR`` — a directory containing ``google/protobuf``
   (explicit user opt-in, takes precedence over probing);
3. well-known vendored locations (probed, used only if importable).

When a discovered runtime is *older* than the gencode pyspark ships,
protobuf's own official escape hatch ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_
CHECK`` is set (see ``google/protobuf/runtime_version.py`` upstream — the
check exists to surface skew, and the skew here is minor-version-sized).
The real compatibility gate is behavioral, not a version string: the
end-to-end equivalence test (tests/test_streaming.py::
test_tws_join_matches_edge_cases) replays the FIXTURES.md edge-case scenario
through the TWS operator and compares the emission trace against the
portable ``applyInPandasWithState`` implementation — if the wire protocol
were actually incompatible, that test fails loudly.

MUST run before the SparkSession is built: the JVM snapshots the process
environment at launch, and the streaming Python workers inherit
``PYTHONPATH`` + the version-check toggle from that snapshot.  Importing
``kafka_streams_one_to_many_join_spark.streaming`` (which imports this) at
program start — the normal import order — satisfies that.
"""

from __future__ import annotations

import os
import sys

# Public SDKs known to vendor a complete standalone protobuf runtime.
_WELL_KNOWN_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _importable(path: str) -> bool:
    """True if ``google.protobuf.descriptor`` imports with ``path`` added.

    Catches *any* exception, not just ImportError: an incompatible vendored
    copy (e.g. a Python-2-era runtime) can raise SyntaxError / AttributeError
    at import time, and a probe failure must degrade to "not available", not
    crash package import.  On failure, only the modules the probe itself
    half-imported are evicted — pre-existing ``google.*`` packages (e.g.
    ``google.auth``) keep their identity.
    """
    before = set(sys.modules)
    sys.path.append(path)
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except Exception:
        if path in sys.path:
            sys.path.remove(path)
        for mod in [
            m
            for m in sys.modules
            if m.startswith("google") and m not in before
        ]:
            del sys.modules[mod]
        return False


def _gencode_loadable() -> bool:
    """The just-imported runtime can actually load pyspark's generated
    protobuf code: ``google.protobuf.internal.builder`` (the entry point
    every modern ``*_pb2.py`` calls) must exist.  A runtime old enough to
    lack it would fail later inside the streaming worker regardless of any
    version-check toggle, so it is rejected here instead of "enabled" by
    blindly disabling the version check.
    """
    try:
        import google.protobuf.internal.builder  # noqa: F401

        return True
    except Exception:
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here AND in Spark's Python
    workers, discovering a standalone runtime if needed.  Idempotent.

    Returns True if protobuf is (now) importable.
    """
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        pass

    explicit = os.environ.get("SPARK_GRAFT_PROTOBUF_DIR")
    candidates = ([explicit] if explicit else []) + list(_WELL_KNOWN_PROTOBUF_DIRS)
    for cand in candidates:
        try:
            if not (
                cand and os.path.isdir(os.path.join(cand, "google", "protobuf"))
            ):
                continue
            if not _importable(cand):
                continue
            if not _gencode_loadable():
                # importable but too old to execute pyspark's gencode — back
                # out exactly what the probe added and keep looking
                if cand in sys.path:
                    sys.path.remove(cand)
                for mod in [m for m in sys.modules if m.startswith("google")]:
                    if getattr(
                        sys.modules[mod], "__file__", ""
                    ) and str(sys.modules[mod].__file__).startswith(cand):
                        del sys.modules[mod]
                continue
            # Workers see the runtime through PYTHONPATH (JVM env snapshot).
            prev = os.environ.get("PYTHONPATH", "")
            if cand not in prev.split(os.pathsep):
                os.environ["PYTHONPATH"] = (
                    f"{prev}{os.pathsep}{cand}" if prev else cand
                )
            # Official protobuf knob, set only for a runtime that passed the
            # gencode-capability check above; remaining (minor-version) skew
            # is verified behaviorally by the TWS equivalence test (module
            # docstring).
            os.environ.setdefault(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
            )
            return True
        except Exception:
            # any discovery failure degrades to "no runtime found" for this
            # candidate — never crash importing the streaming package
            continue
    return False
