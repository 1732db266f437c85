"""google.protobuf resolution for transformWithStateInPandas.

Spark 4's typed-state API speaks protobuf between the Python worker
and the JVM state server (pyspark/sql/streaming/proto/
StateMessage_pb2.py), but the runtime package is an optional pyspark
dependency and absent in some execution environments. Rather than
fail-fasting (the round-3..5 behavior), `ensure_protobuf()` falls back
to the pure-python protobuf runtime that a locally installed Google
Cloud SDK bundles (public, Apache-2.0) under the rewritten
``cloudsdk.google`` namespace, aliasing it to ``google.protobuf`` via
a meta-path finder so every module is a SINGLE instance under both
names (duplicate descriptor/message classes would break isinstance
checks inside the runtime).

Two version shims make the 4.23 SDK runtime accept protoc-5.x
generated code: a no-op ``runtime_version`` module (the real one
appeared in protobuf 5.27 and only performs a gencode/runtime version
handshake), and nothing else — the descriptor-pool/builder API the
gencode uses has been stable since protobuf 4.21.

Worker processes need no environment plumbing: unpickling a
StatefulProcessor imports its defining module, which calls
`ensure_protobuf()` at import time, installing the alias in that
worker before the state-client's lazy ``import
...StateMessage_pb2`` runs.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import os
import sys
import types

# Override point for non-default Cloud SDK install locations.
_ENV = "SPARK_GRAFT_CLOUDSDK_THIRD_PARTY"
_DEFAULT_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, target: types.ModuleType) -> None:
        self._target = target

    def create_module(self, spec):  # return the EXISTING module object
        return self._target

    def exec_module(self, module) -> None:  # already executed
        pass


class _ProtobufAliasFinder(importlib.abc.MetaPathFinder):
    """Resolve ``google`` / ``google.protobuf[.X]`` to the identical
    ``cloudsdk.google...`` module objects. Scoped strictly to the
    protobuf subtree (plus the bare ``google`` namespace hop needed to
    reach it) so no other Cloud SDK third-party package leaks into the
    ``google`` namespace."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname != "google" and not (
            fullname == "google.protobuf"
            or fullname.startswith("google.protobuf.")
        ):
            return None
        if fullname == "google":
            # Claim the bare parent ONLY when no path-based portion
            # exists at all (r6 advice: claiming it unconditionally
            # narrowed google.__path__ to the cloudsdk tree, so fresh
            # imports of genuinely installed distributions like
            # google.auth / google.cloud.* raised ModuleNotFoundError).
            # When any real portion resolves — even the vacuous
            # spark-core.jar resource dir — let the normal machinery
            # build the parent; `google.protobuf` itself is still
            # aliased below because this finder sits FIRST in
            # sys.meta_path, ahead of any parent __path__ search.
            if importlib.machinery.PathFinder.find_spec("google") is not None:
                return None
        try:
            mod = importlib.import_module("cloudsdk." + fullname)
        except ModuleNotFoundError:
            return None
        return importlib.machinery.ModuleSpec(
            fullname, _AliasLoader(mod), is_package=hasattr(mod, "__path__")
        )


def _trace(msg: str) -> None:
    path = os.environ.get("SPARK_GRAFT_PBCOMPAT_DEBUG")
    if path:
        with open(path, "a") as fh:
            fh.write(f"[pid {os.getpid()}] {msg}\n")


def ensure_protobuf() -> bool:
    """True if ``google.protobuf`` is importable, installing the Cloud
    SDK alias if needed. Idempotent; safe to call in driver and worker
    processes alike."""
    try:
        # importing the package is NOT sufficient proof: Spark workers
        # have spark-core.jar on sys.path, whose google/protobuf/*.proto
        # RESOURCE directory imports as a vacuous namespace package
        # (file=None, no python modules). Require the actual runtime.
        importlib.import_module("google.protobuf.descriptor")
        _trace("native google.protobuf runtime OK")
        return True
    except ImportError as e:
        _trace(f"native runtime import failed: {e}")
    # drop any vacuous namespace-package entries the probe above (or an
    # earlier unrelated import) left behind — a stale sys.modules entry
    # would bypass the alias finder installed below
    for name in [
        n for n in list(sys.modules) if n == "google" or n.startswith("google.")
    ]:
        mod = sys.modules[name]
        if getattr(mod, "__file__", None) is None:
            del sys.modules[name]
    third_party = os.environ.get(_ENV, _DEFAULT_THIRD_PARTY)
    if not os.path.isdir(
        os.path.join(third_party, "cloudsdk", "google", "protobuf")
    ):
        return False
    if third_party not in sys.path:
        sys.path.append(third_party)
    try:
        real = importlib.import_module("cloudsdk.google.protobuf")
    except Exception:
        return False
    if not hasattr(real, "runtime_version"):
        rv = types.ModuleType("google.protobuf.runtime_version")

        class _Domain:  # mirrors protobuf 5.x runtime_version.Domain
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        rv.Domain = _Domain
        rv.VersionError = Exception
        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        sys.modules["google.protobuf.runtime_version"] = rv
        sys.modules["cloudsdk.google.protobuf.runtime_version"] = rv
        real.runtime_version = rv
    if not any(isinstance(f, _ProtobufAliasFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _ProtobufAliasFinder())
    try:
        importlib.import_module("google.protobuf")
        # prove the pyspark gencode actually loads against this runtime
        importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        _trace("alias installed; StateMessage_pb2 OK")
        return True
    except Exception as e:
        import traceback

        _trace("alias verify failed: " + traceback.format_exc())
        return False
