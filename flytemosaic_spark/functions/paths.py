"""URL/path column expressions (SURVEY §2.7 F1-F5).

The reference builds and rewrites object-store urls with Python
string ops (flytemosaic/mosaics.py:74-76 vsi scheme rewrite;
glad.py:25,54-57 url templating; protocols.py:36-37,84-85 path
join / relative-to). Here they are Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_VSI_SCHEMES = {"gs://": "/vsigs/", "s3://": "/vsis3/"}


def vsi_rewrite(url: Column) -> Column:
    """F1 — ``gs:// → /vsigs/``, ``s3:// → /vsis3/`` (mosaics.py:74-76)."""
    out = url
    for scheme, vsi in _VSI_SCHEMES.items():
        out = F.regexp_replace(out, f"^{scheme}", vsi)
    return out


def url_template(fmt: str, *cols: Column) -> Column:
    """F3 — printf-style url templating (glad.py:25,54-57)."""
    return F.format_string(fmt, *cols)


def path_join(*parts: Column | str) -> Column:
    """F5 — '/'-joined path (protocols.py:36-37,244-245)."""
    return F.concat_ws("/", *parts)


def relative_to(url: Column, prefix: str) -> Column:
    """F4 — strip a leading prefix (protocols.py:84-85, glad.py:154-156)."""
    return F.regexp_replace(url, "^" + prefix, "")
