"""Data-pipeline CLI — download / convert / remap.

Replaces the reference's utils/ scripts (`0_download_raw.sh`,
`1_convert_pd*.py` ×11, `2_remap_id.py`) with one entry point:

  python -m tlsan_tpu.data.cli download --category Digital_Music --out raw/
  python -m tlsan_tpu.data.cli convert  --reviews raw/reviews_X_5.json \
      --meta raw/meta_X.json --out raw/
  python -m tlsan_tpu.data.cli remap    --reviews raw/reviews.pkl \
      --meta raw/meta.pkl --out Data/Digital_Music.pkl

`remap` emits the reference-compatible 3-object pickle that every model's
dataset builder consumes (format doc: data/remap.py).
"""

from __future__ import annotations

import argparse
import gzip
import os
import pickle
import sys
import urllib.request

from tlsan_tpu.data.remap import (
    CATEGORIES,
    convert_raw_lines,
    raw_urls,
    remap_ids,
    save_category,
)


def cmd_download(args):
    os.makedirs(args.out, exist_ok=True)
    rev_url, meta_url = raw_urls(args.category)
    if args.base_url:
        # mirror / local fixture override (also how the zero-egress test
        # exercises this path end-to-end with file:// URLs)
        from tlsan_tpu.data.remap import SNAP_URL
        rev_url = rev_url.replace(SNAP_URL, args.base_url.rstrip("/"))
        meta_url = meta_url.replace(SNAP_URL, args.base_url.rstrip("/"))
    for url in (rev_url, meta_url):
        dest = os.path.join(args.out, os.path.basename(url))
        if os.path.exists(dest) or os.path.exists(dest[:-3]):
            print(f"skip {dest} (exists)")
            continue
        print(f"fetching {url} ...", flush=True)
        try:
            urllib.request.urlretrieve(url, dest)
        except OSError as e:
            print(f"download failed ({e}); this environment may have no "
                  f"network egress — fetch manually and re-run convert",
                  file=sys.stderr)
            return 1
    return 0


def _open_lines(path):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def cmd_convert(args):
    with _open_lines(args.reviews) as f:
        review_lines = f.readlines()
    with _open_lines(args.meta) as f:
        meta_lines = f.readlines()
    reviews_df, meta_df = convert_raw_lines(review_lines, meta_lines)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "reviews.pkl"), "wb") as f:
        pickle.dump(reviews_df, f, pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(args.out, "meta.pkl"), "wb") as f:
        pickle.dump(meta_df, f, pickle.HIGHEST_PROTOCOL)
    print(f"converted: {len(reviews_df)} reviews, {len(meta_df)} meta rows")
    return 0


def cmd_remap(args):
    with open(args.reviews, "rb") as f:
        reviews_df = pickle.load(f)
    with open(args.meta, "rb") as f:
        meta_df = pickle.load(f)
    reviews_df, meta_df, item_cate_list, counts = remap_ids(
        reviews_df, meta_df,
        min_item_interactions=args.min_item,
        min_user_interactions=args.min_user,
        min_sessions=args.min_sessions,
        max_sessions=args.max_sessions,
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_category(args.out, reviews_df, meta_df, item_cate_list, counts)
    print(f"user_count: {counts.user_count}\titem_count: {counts.item_count}\t"
          f"cate_count: {counts.cate_count}\texample_count: {counts.example_count}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("download", help="fetch raw Amazon SNAP dumps")
    d.add_argument("--category", choices=CATEGORIES, required=True)
    d.add_argument("--out", default="raw_data")
    d.add_argument("--base_url", default=None,
                   help="mirror/fixture base replacing the SNAP host "
                        "(file:///... works)")
    d.set_defaults(fn=cmd_download)

    c = sub.add_parser("convert", help="JSON-lines → reviews.pkl/meta.pkl")
    c.add_argument("--reviews", required=True)
    c.add_argument("--meta", required=True)
    c.add_argument("--out", default="raw_data")
    c.set_defaults(fn=cmd_convert)

    r = sub.add_parser("remap", help="filter + dense-remap → Data/<Cat>.pkl")
    r.add_argument("--reviews", required=True)
    r.add_argument("--meta", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--min_item", type=int, default=8)
    r.add_argument("--min_user", type=int, default=10)
    r.add_argument("--min_sessions", type=int, default=4)
    r.add_argument("--max_sessions", type=int, default=90)
    r.set_defaults(fn=cmd_remap)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
