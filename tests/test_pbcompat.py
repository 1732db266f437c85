"""google.protobuf resolution shims (streaming/pbcompat.py).

Each case runs in a SUBPROCESS: the whole point of pbcompat is import-
system surgery (meta-path finder, sys.modules purge), which must not
leak into — or be masked by — the pytest process's own import state.

The r6 advice finding pinned here: the alias finder used to claim the
bare ``google`` name unconditionally, so once the Cloud SDK fallback
engaged, ``google.__path__`` covered only the cloudsdk tree and fresh
imports of genuinely installed sibling distributions (google.auth,
google.cloud.*) raised ModuleNotFoundError. The finder now claims
``google`` only when NO path-based portion exists; ``google.protobuf``
is still aliased because the finder sits first in sys.meta_path.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run(code: str, extra_path: str | None = None) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + (os.pathsep + extra_path if extra_path else "")
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )


def test_ensure_protobuf_provides_runtime():
    proc = _run(
        """
        from smart_energy_consumption_analytics_using_big_data_spark.streaming.pbcompat import ensure_protobuf
        assert ensure_protobuf() is True
        import google.protobuf.descriptor as d
        assert d.__file__, "vacuous namespace package is not a runtime"
        print("OK")
        """
    )
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


def test_alias_does_not_shadow_sibling_google_distributions(tmp_path):
    # a genuine sibling distribution: google.fakeauth from its own
    # sys.path portion, imported AFTER the protobuf fallback engages
    pkg = tmp_path / "site" / "google" / "fakeauth"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("MARK = 'sibling-ok'\n")
    proc = _run(
        f"""
        from smart_energy_consumption_analytics_using_big_data_spark.streaming.pbcompat import ensure_protobuf
        assert ensure_protobuf() is True
        import google.protobuf.descriptor as d
        assert d.__file__
        import google.fakeauth
        assert google.fakeauth.MARK == 'sibling-ok'
        import google
        assert any('{tmp_path.name}' in p for p in google.__path__), google.__path__
        print("OK")
        """,
        extra_path=str(tmp_path / "site"),
    )
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout
