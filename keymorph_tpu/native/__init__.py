"""Native (C++) host-side helpers. Built on demand; pure-Python fallbacks
exist everywhere, so the package works without compilation."""

from keymorph_tpu.native import kmio  # noqa: F401
