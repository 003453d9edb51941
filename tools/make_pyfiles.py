"""Package laji_pygeoapi_spark into dist/laji_pygeoapi_spark.zip for
``spark-submit --py-files`` (executors import the package from the zip).

The zip is built DETERMINISTICALLY (sorted walk, pinned timestamps) and
swapped in atomically: two concurrent sessions that both rebuild from the
same sources produce byte-identical archives, so an executor that already
fetched the file never hits Spark's "exists and does not match contents"
guard (observed when two check_oracles runs raced the rebuild)."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "laji_pygeoapi_spark.zip")
    pkg = os.path.join(ROOT, "laji_pygeoapi_spark")
    tmp = out + f".tmp-{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    info = zipfile.ZipInfo(os.path.relpath(full, ROOT),
                                           date_time=(2020, 1, 1, 0, 0, 0))
                    info.compress_type = zipfile.ZIP_DEFLATED
                    info.external_attr = 0o644 << 16
                    with open(full, "rb") as f:
                        z.writestr(info, f.read())
    # skip the swap when bytes are unchanged: a session that already
    # shipped the old file keeps a valid reference
    if os.path.exists(out):
        with open(out, "rb") as a, open(tmp, "rb") as b:
            same = a.read() == b.read()
        if same:
            os.remove(tmp)
            print(out)
            return out
    os.replace(tmp, out)
    print(out)
    return out


if __name__ == "__main__":
    main()
