"""Flagship kill-resume proof (north rule: "a killed run resumes
exactly"; BASELINE.md Resumability).

Protocol:
  1. child run A starts the full KG pipeline (chunk-committed extract)
     in a fresh workdir; the parent SIGKILLs the whole process group
     once >= --kill-after extract chunks have committed.
  2. the committed chunks' parquet files are fingerprinted
     (path, size, mtime).
  3. child run B resumes in the same workdir to completion; the
     fingerprints must be untouched (no re-extraction of done
     partitions).
  4. child run C executes the identical input in a separate workdir
     with no kill (the reference trajectory).
  5. the final materialized triple sets of B and C are compared
     exactly (exceptAll both ways == 0) plus an order-insensitive
     fingerprint (count + sum(crc32) + sum(xxhash64)).

Evidence lands in BENCH/kill_resume.json.

Usage:
  python tools/kill_resume.py [--pages 420000] [--cpus 32]
                              [--chunks 8] [--kill-after 3]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_session(cpus: int):
    from py_sema_spark.session import build_session as bs

    return bs(master=f"local[{cpus}]")


def child_main(workdir: str, pages: int, cpus: int, chunks: int) -> None:
    from pyspark.sql import functions as F

    from py_sema_spark.pipeline import Pipeline
    from py_sema_spark.sources.corpus import synth_corpus

    spark = build_session(cpus)
    corpus_path = os.path.join(workdir, "corpus")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synth_corpus(spark, n_pages=pages, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    out = Pipeline(spark, os.path.join(workdir, "pipe")).run(
        corpus, extract_chunks=chunks
    )
    n = out.count()
    print(f"CHILD_DONE triples={n}", flush=True)
    spark.stop()


def _chunk_markers(stage_dir: str):
    if not os.path.isdir(stage_dir):
        return []
    return sorted(
        f for f in os.listdir(stage_dir) if f.startswith("_CHUNK_DONE_")
    )


def _fingerprint_chunks(stage_dir: str, markers) -> dict:
    fp = {}
    for m in markers:
        i = m.rsplit("_", 1)[1]
        cdir = os.path.join(stage_dir, f"chunk={i}")
        for root, _dirs, files in os.walk(cdir):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                fp[os.path.relpath(p, stage_dir)] = (st.st_size, st.st_mtime)
    return fp


def _spawn(workdir: str, pages: int, cpus: int, chunks: int):
    return subprocess.Popen(
        [
            sys.executable, os.path.abspath(__file__), "--child",
            workdir, str(pages), str(cpus), str(chunks),
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        start_new_session=True,  # kill the whole group incl. the JVM
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=420000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--kill-after", type=int, default=3)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH", "kill_resume.json")
    )
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import shutil
    import tempfile

    base = args.workdir or tempfile.mkdtemp(prefix="kill_resume_")
    wd_kill = os.path.join(base, "killed")
    wd_ref = os.path.join(base, "ref")
    os.makedirs(wd_kill, exist_ok=True)
    os.makedirs(wd_ref, exist_ok=True)
    stage_dir = os.path.join(wd_kill, "pipe", "01_extract")
    evidence: dict = {
        "pages": args.pages,
        "cpus": args.cpus,
        "chunks": args.chunks,
        "kill_after_chunks": args.kill_after,
    }

    # --- phase 1: run + SIGKILL mid-extract ---
    t0 = time.time()
    child = _spawn(wd_kill, args.pages, args.cpus, args.chunks)
    killed_at = None
    while child.poll() is None:
        markers = _chunk_markers(stage_dir)
        if len(markers) >= args.kill_after:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            killed_at = len(markers)
            break
        time.sleep(0.2)
    child.wait()
    if killed_at is None:
        print("FAIL: run finished before the kill trigger — raise --pages "
              "or lower --kill-after", file=sys.stderr)
        sys.exit(2)
    markers = _chunk_markers(stage_dir)
    evidence["chunks_done_before_kill"] = len(markers)
    evidence["phase1_secs"] = round(time.time() - t0, 2)
    prekill_fp = _fingerprint_chunks(stage_dir, markers)
    evidence["prekill_committed_files"] = len(prekill_fp)
    assert not os.path.exists(os.path.join(stage_dir, "_STAGE_DONE"))

    # --- phase 2: resume to completion ---
    t0 = time.time()
    child = _spawn(wd_kill, args.pages, args.cpus, args.chunks)
    out_b, _ = child.communicate()
    if child.returncode != 0:
        print(out_b.decode()[-4000:], file=sys.stderr)
        sys.exit(2)
    evidence["phase2_secs"] = round(time.time() - t0, 2)
    post_fp = _fingerprint_chunks(stage_dir, markers)
    untouched = prekill_fp == post_fp
    evidence["prekill_files_untouched"] = untouched

    # --- phase 3: uninterrupted reference run ---
    t0 = time.time()
    child = _spawn(wd_ref, args.pages, args.cpus, args.chunks)
    out_c, _ = child.communicate()
    if child.returncode != 0:
        print(out_c.decode()[-4000:], file=sys.stderr)
        sys.exit(2)
    evidence["phase3_secs"] = round(time.time() - t0, 2)

    # --- compare final triples exactly ---
    from pyspark.sql import functions as F

    spark = build_session(args.cpus)
    cols = ["s", "p", "o", "o_kind", "o_datatype", "o_lang", "g"]
    a = spark.read.parquet(os.path.join(wd_kill, "pipe", "05_materialize"))
    b = spark.read.parquet(os.path.join(wd_ref, "pipe", "05_materialize"))

    def fingerprint(df):
        line = F.concat_ws(
            "\x01", *[F.coalesce(F.col(c), F.lit("\x00")) for c in cols]
        )
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.crc32(line)).alias("crc"),
            F.sum(F.xxhash64(line).cast("decimal(38,0)")).alias("xx"),
        ).collect()[0]
        return {"rows": row["n"], "crc": int(row["crc"]),
                "xx": str(row["xx"])}

    fa, fb = fingerprint(a), fingerprint(b)
    diff = (
        a.select(cols).exceptAll(b.select(cols)).count()
        + b.select(cols).exceptAll(a.select(cols)).count()
    )
    spark.stop()
    evidence["resumed_fingerprint"] = fa
    evidence["reference_fingerprint"] = fb
    evidence["rowset_diff"] = diff
    evidence["identical"] = bool(diff == 0 and fa == fb and untouched)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(evidence, fh, indent=2)
    print(json.dumps(evidence, indent=2))
    if not args.workdir:
        shutil.rmtree(base, ignore_errors=True)
    sys.exit(0 if evidence["identical"] else 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
        )
    else:
        main()
