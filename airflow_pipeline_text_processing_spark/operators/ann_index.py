"""Persisted IVF-PQ index: built once, queried forever.

``sim_ivfpq_topk`` (operators/similarity.py::ivfpq_topk) trains its IVF
centroids and PQ codebooks inside the query -- fine for an oracle-graded
one-shot, wrong for the 100 TB story where the index is a long-lived
artifact that absorbs incremental vector batches and serves many query
batches.  This module composes the engine's two existing subsystems into
that artifact:

* the **manifest table format** (sources/manifest.py) stores the big,
  mutable part -- one row per vector: its ``replicas`` IVF cell
  memberships and its ``m`` PQ codes -- with copy-on-write MERGE for
  incremental adds, time travel, and file-level pruning;
* the **frozen routing structures** (IVF centroids, PQ codebooks, index
  meta) are written once at build time as driver-side parquet/JSON
  sidecars -- metadata-sized (cells x dim + m x k x sub_dim BIGINTs),
  exactly what a FAISS IndexIVFPQ persists.

Incremental adds assign new vectors against the FROZEN structures (one
shuffle-free numpy map stage each for cells and codes, then a MERGE that
rewrites only overlapping files); they never retrain.  The staleness
metric (vectors added since training / trained corpus size) tells the
operator when a rebuild is due -- the standard drift dial for a
frozen-quantizer index.

Scale shape of ``search``: queries route against broadcast centroids;
candidates come from an EQUI-join of exploded cell memberships; ADC
scores touch only the m-code rows of probed cells; full-width vectors
are read (from the caller's base table) only for the ``prefilter``
rerank survivors.  Every distance is a BIGINT (fixed-point), so a SQL
oracle replays the whole pipeline exactly.

Reference parity note: the reference has no ANN surface at all; this is
part of the LLM-data-pipeline extension mandated by BASELINE.json.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.manifest import (
    merge_upsert,
    read_live,
    repoint_files,
    write_manifest_table,
)
from .clustering import assign_top_cells, kmeans_fixed_point
from .similarity import (
    _pq_assign_codes,
    _pq_sqdist,
    _pq_subsplit,
    pq_train_encode,
    residual_adc_tables,
    residual_vectors,
)

_ROWS = "rows"
_FROZEN = "_frozen"
# Lock-steal window for the meta sidecar's mutator lock: a lock FILE older
# than this is crashed-holder residue (holders keep it for milliseconds,
# never across a Spark job).  Module-level so tests can shrink it.
_STEAL_AFTER = 30.0


def _pid_alive(pid: int) -> bool:
    """Liveness probe for the dead-slot GC.  On POSIX ``os.kill(pid,
    0)`` sends no signal but performs the existence/permission check;
    ``PermissionError`` means the pid EXISTS under another user --
    treat as alive, never collect (ADVICE r13: the previous
    ``/proc/<pid>`` probe made every foreign process look dead
    off-Linux, reintroducing the cross-process rmtree race the pid
    suffix exists to prevent).  On non-POSIX there is NO benign probe
    -- CPython's ``os.kill`` on Windows TERMINATES the target for
    ordinary signal values (r14 self-review) -- so every pid reports
    alive and slots are simply never collected there: a bounded disk
    leak is the safe failure mode, killing a concurrent builder is
    not."""
    if os.name != "posix":
        return True
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except (PermissionError, OSError):
        return True
    return True


def process_index_slot(slot_key: str) -> str:
    """Deterministic per-(key, process) tmp path for a persisted index:
    deterministic so repeat runs in one process reuse a single slot
    (the ADVICE r9 orphan-accretion fix), pid-suffixed so a concurrent
    process (the driver grading while a local bench runs) can't rmtree
    an index another process is mid-build/mid-collect on (r10 review
    finding).  Slots whose owning pid is provably gone (portable
    ``os.kill(pid, 0)`` probe, not ``/proc``) are garbage-collected."""
    import hashlib
    import shutil
    import tempfile

    slot = f"ivfpq_index_{hashlib.md5(slot_key.encode()).hexdigest()[:16]}"
    tmp = tempfile.gettempdir()
    for entry in os.listdir(tmp):
        if entry.startswith(slot + "_"):
            try:
                if not _pid_alive(int(entry.rsplit("_", 1)[1])):
                    shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)
            except ValueError:
                pass
    return os.path.join(tmp, f"{slot}_{os.getpid()}")


def _write_meta(path: str, meta: dict) -> None:
    """Atomically (re)write the meta sidecar: temp file + os.rename,
    so a crash mid-write or a concurrent reader never sees truncated
    JSON (r11 review -- the add path rewrites the LIVE index's meta on
    every batch; same beside-then-swap discipline as the rebuild)."""
    fz = os.path.join(path, _FROZEN)
    tmp = os.path.join(fz, f".meta.{os.getpid()}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, os.path.join(fz, "meta.json"))


def _meta_mutate(path: str, fn) -> bool:
    """Serialized read-modify-write of the meta sidecar (r14 review):
    concurrent ``ivfpq_index_add`` calls are a SUPPORTED scenario (the
    manifest layer retries their row merges on conflict), so the
    occupancy fold must not be a last-rename-wins race that silently
    drops the other writer's counts.  An ``O_CREAT|O_EXCL`` lock file
    (the same claim device as the manifest log slots) serializes
    mutators cross-process; ``fn(meta)`` receives the sidecar re-READ
    inside the lock and returns ``(new_meta_or_None, flag)`` -- None
    skips the write.  The flag is returned to the caller.

    Steal discipline (ADVICE r15): a lock is crashed-holder residue only
    when the lock FILE ITSELF is older than the steal window -- holders
    keep it for milliseconds, never across a Spark job -- so staleness
    is judged by the file's mtime, not by how long THIS caller has been
    waiting (a wait-keyed steal let every starved contender delete a
    live holder's freshly-created lock once past its own deadline,
    reintroducing the lost-fold race the lock exists to prevent).
    After any steal check the local deadline re-arms, so a contender
    makes at most one steal attempt per stale-lock observation."""
    import time as _time

    fz = os.path.join(path, _FROZEN)
    lock = os.path.join(fz, ".meta.lock")
    deadline = _time.monotonic() + _STEAL_AFTER
    while True:
        try:
            os.close(os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            break
        except FileExistsError:
            if _time.monotonic() > deadline:
                try:
                    stale = (
                        _time.time() - os.stat(lock).st_mtime > _STEAL_AFTER
                    )
                except OSError:
                    stale = False  # holder released between EXCL and stat
                if stale:
                    try:
                        os.unlink(lock)  # provably-crashed holder: steal
                    except OSError:
                        pass  # another contender claimed it first
                # re-arm whether stolen or young: a fresh lock gets a
                # fresh window, and one observation yields one attempt
                deadline = _time.monotonic() + _STEAL_AFTER
            else:
                _time.sleep(0.05)
    try:
        with open(os.path.join(fz, "meta.json")) as fh:
            meta = json.load(fh)
        new_meta, flag = fn(meta)
        if new_meta is not None:
            _write_meta(path, new_meta)
        return flag
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _write_frozen(path: str, cents_rows, codebook_rows, meta: dict) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    fz = os.path.join(path, _FROZEN)
    os.makedirs(fz, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "cid": [c for c, _ in cents_rows],
                "c": [v for _, v in cents_rows],
            }
        ),
        os.path.join(fz, "centroids.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "sub": [s for s, _, _ in codebook_rows],
                "cid": [c for _, c, _ in codebook_rows],
                "c": [v for _, _, v in codebook_rows],
            }
        ),
        os.path.join(fz, "codebooks.parquet"),
    )
    _write_meta(path, meta)


def _load_frozen(path: str):
    import pyarrow.parquet as pq

    fz = os.path.join(path, _FROZEN)
    cents = pq.read_table(os.path.join(fz, "centroids.parquet")).to_pylist()
    books = pq.read_table(os.path.join(fz, "codebooks.parquet")).to_pylist()
    with open(os.path.join(fz, "meta.json")) as fh:
        meta = json.load(fh)
    cents_rows = [(r["cid"], list(r["c"])) for r in cents]
    cents_lit = {(r["sub"], r["cid"]): list(r["c"]) for r in books}
    if meta.get("encoding") != "residual":
        # fail FAST and clearly: a pre-residual index has no pcell column
        # in its rows table and raw-vector codes -- serving it with the
        # residual ADC path would die on an opaque missing-column error
        # (or worse, an add would merge mixed-schema rows first)
        raise ValueError(
            f"index at {path} predates residual encoding "
            f"(meta.encoding={meta.get('encoding')!r}); rebuild it with "
            "build_ivfpq_index / ivfpq_index_rebuild_if_stale"
        )
    return cents_rows, cents_lit, meta


def _heal_crashed_rebuild(spark: SparkSession, path: str) -> None:
    """Complete a rebuild swap that crashed mid-flight (r14 review):
    ``ivfpq_index_rebuild_if_stale`` is rename -> rename -> repoint ->
    cleanup, and a crash between any two steps leaves the live manifest
    pointing at the vanished ``.rebuild`` staging prefix (or the index
    dir itself missing, mid-double-rename).  Every crash point is
    recoverable by replaying the REMAINING steps, all idempotent, so
    the consumers call this first; the quick-existence gate makes the
    healthy-path cost two stat() calls.  (The ``.old``/``.rebuild``
    dirs exist ONLY during a swap or after a crash -- success removes
    both.)"""
    import shutil

    from ..sources.manifest import read_manifest, repoint_files

    base = path.rstrip("/")
    tmp, old = base + ".rebuild", base + ".old"
    if not os.path.exists(tmp) and not os.path.exists(old):
        return  # healthy path
    try:
        if not os.path.exists(base) and os.path.exists(tmp):
            # crashed between rename(path, old) and rename(tmp, path):
            # the replacement is fully built -- finish its promotion
            os.rename(tmp, base)
        if os.path.exists(base):
            rows_path = os.path.join(base, _ROWS)
            man = read_manifest(spark, rows_path).collect()
            if any(tmp + "/" in r.file for r in man):
                # crashed before the repoint commit: replay it
                repoint_files(spark, rows_path, tmp, base)
        if os.path.exists(old) and os.path.exists(base):
            shutil.rmtree(old, ignore_errors=True)
    except OSError:
        # a concurrent healer/rebuilder won the race; its completed
        # swap leaves nothing to do
        pass


def _index_rows(cells: DataFrame, codes: DataFrame) -> DataFrame:
    """One row per vector: sorted cell-membership array (set semantics --
    search only tests membership) + the code array indexed by subspace."""
    cell_arr = cells.groupBy("vec_id").agg(
        F.array_sort(F.collect_list("cid")).alias("cells")
    )
    code_arr = codes.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cid"))),
            lambda x: x["cid"],
        ).alias("codes")
    )
    return cell_arr.join(code_arr, "vec_id")


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    m: int = 8,
    k_codebook: int = 16,
    pq_iters: int = 2,
    cells: int = 8,
    cell_iters: int = 2,
    replicas: int = 2,
    n_files: int = 8,
) -> None:
    """Train IVF centroids + PQ codebooks on ``corpus`` ``(vec_id,
    q array<long>)`` and persist the index at ``path``: the per-vector
    rows as a manifest table (MERGE-able), the routing structures as
    frozen sidecars.  Training cost is paid here ONCE."""
    spark = corpus.sparkSession
    corpus = corpus.select("vec_id", "q").localCheckpoint(eager=False)

    _, cents, ivf_lit = kmeans_fixed_point(
        corpus, k=cells, iters=cell_iters, return_lit=True
    )
    cents = cents.localCheckpoint(eager=False)
    cell_rows = assign_top_cells(
        corpus, cents, replicas, cents_lit=ivf_lit
    ).localCheckpoint(eager=False)
    # RESIDUAL encoding (FAISS IndexIVFPQ): codebooks train on and codes
    # quantize q - centroid(primary cell), so the k_codebook entries only
    # span the within-cell spread -- see similarity.ivfpq_topk's docstring
    # for the measured recall cliff of raw-vector codes on clustered data.
    # The primary cell is rank 1 of the SAME assignment pass.
    pcells = cell_rows.filter(F.col("rank") == 1).select(
        "vec_id", F.col("cid").alias("pcell")
    )
    codes, pq_cents = pq_train_encode(
        residual_vectors(corpus, pcells, cents),
        dim=dim, m=m, k=k_codebook, iters=pq_iters,
    )
    rows = _index_rows(cell_rows, codes).join(pcells, "vec_id")
    # primary-cell occupancy (one count per cell -- metadata-sized),
    # keyed by cell id so incremental adds can FOLD their batch counts
    # in instead of rescanning the table (r11 review): ivfpq_index_
    # search's auto rerank depth reads these so the default prefilter
    # tracks THIS corpus's cell density instead of a fixed constant
    # (the r10 recall-0.12 footgun, PROFILE_r10 SS1)
    occ = {
        str(r["pcell"]): r["n"]
        for r in pcells.groupBy("pcell").agg(F.count("*").alias("n")).collect()
    }
    trained_n = rows.count()
    if trained_n == 0:
        raise ValueError(
            "build_ivfpq_index: empty training corpus -- an index trained "
            "on zero vectors has undefined quantizers and a zero staleness "
            "denominator"
        )
    write_manifest_table(rows, os.path.join(path, _ROWS), "vec_id", n_files)
    _write_frozen(
        path,
        sorted((r.cid, list(r.c)) for r in cents.collect()),
        sorted((r.sub, r.cid, list(r.c)) for r in pq_cents.collect()),
        {
            "dim": dim,
            "m": m,
            "k_codebook": k_codebook,
            "cells": cells,
            "replicas": replicas,
            "trained_n": trained_n,
            # full build recipe, so rebuild_if_stale retrains identically
            "pq_iters": pq_iters,
            "cell_iters": cell_iters,
            "n_files": n_files,
            "encoding": "residual",
            # primary-cell occupancy {cell id: member count}: the
            # search path's auto rerank depth = max(4k, 2 * p90 of the
            # counts); ivfpq_index_add folds each batch's counts in
            "cell_occupancy": occ,
        },
    )


def ivfpq_index_add(
    spark: SparkSession, path: str, batch: DataFrame
) -> Tuple[int, int]:
    """Incrementally add ``batch`` ``(vec_id, q)`` to a built index:
    assign cells and codes against the FROZEN structures (no retraining,
    two shuffle-free numpy map stages) and MERGE into the rows table --
    same-key rows are replaced (re-adding a vector updates it), new keys
    append, and only overlapping files rewrite.  Returns merge_upsert's
    ``(files_rewritten, live_files_before)``."""
    _heal_crashed_rebuild(spark, path)
    cents_rows, cents_lit, meta = _load_frozen(path)
    batch = batch.select("vec_id", "q").localCheckpoint(eager=False)
    cents = spark.createDataFrame(
        [(c, v) for c, v in cents_rows], "cid int, c array<bigint>"
    )
    cell_rows = assign_top_cells(
        batch, cents, meta["replicas"], cents_lit=cents_rows
    ).localCheckpoint(eager=False)
    pcells = cell_rows.filter(F.col("rank") == 1).select(
        "vec_id", F.col("cid").alias("pcell")
    )
    codes = _pq_assign_codes(
        residual_vectors(batch, pcells, cents),
        cents_lit, meta["m"], meta["dim"] // meta["m"],
    )
    rows = _index_rows(cell_rows, codes).join(pcells, "vec_id")
    out = merge_upsert(spark, os.path.join(path, _ROWS), rows, "vec_id")
    # refresh the occupancy stats the auto rerank depth reads: adds
    # grow cells past what the build recorded, and a stale p90
    # under-sizes the shortlist.  FOLD the batch's own pcell counts
    # into the stored per-cell map -- O(batch) work + a cells-sized
    # metadata write (r11 review: the streaming sink calls this per
    # micro-batch, so an O(index) refresh would make every add cost
    # O(index)).  Re-ADDED keys leave their old row's count in place,
    # so the map is an UPPER bound under key churn; to keep that bound
    # TIGHT (<= 2x the true counts -- second-pass review: an
    # update-heavy stream otherwise inflates the estimate without
    # limit), an exact recount runs whenever the rows folded since the
    # last recount reach half the estimated size.  Amortized O(1) per
    # added row; the pre-r11 LIST-form sidecar (sorted counts, no cell
    # ids) is un-foldable and triggers the same exact recount.
    batch_counts = {
        str(r["pcell"]): r["n"]
        for r in pcells.groupBy("pcell").agg(F.count("*").alias("n")).collect()
    }

    # per-cell staleness trigger (r12, ADVICE): the global-total trigger
    # bounds TOTAL inflation to <=2x but lets an individual hot cell's
    # estimate drift arbitrarily within that window, skewing the
    # p90-based auto rerank depth.  Track per-cell folds since the last
    # exact recount and recount as soon as any cell's folds reach its
    # last exact count (occ >= 2x exact); cells first seen by a fold
    # (exact == 0 -- their count is pure folds and correct modulo
    # re-add churn) stay under the global trigger only.
    def _fold(meta: dict) -> tuple:
        occ = meta.get("cell_occupancy")
        folded = meta.get("occupancy_folded_n", 0)
        fcells = dict(meta.get("occupancy_folded_cells", {}))
        if not isinstance(occ, dict):
            return None, True  # legacy list sidecar: recount
        occ = dict(occ)
        for c, n in batch_counts.items():
            occ[c] = occ.get(c, 0) + n
            fcells[c] = fcells.get(c, 0) + n
        folded += sum(batch_counts.values())
        meta["cell_occupancy"] = occ
        meta["occupancy_folded_n"] = folded
        meta["occupancy_folded_cells"] = fcells
        cell_hot = any(
            occ[c] - f > 0 and f >= occ[c] - f
            for c, f in fcells.items()
            if c in occ
        )
        return meta, (cell_hot or 2 * folded >= sum(occ.values()))

    # the fold is a read-modify-write of a SHARED sidecar and the
    # manifest layer explicitly supports concurrent adds (merge_upsert
    # retries conflicts) -- so it runs under the meta lock with the
    # sidecar re-READ inside, never against this call's possibly-stale
    # snapshot: a last-rename-wins race would silently drop the other
    # writer's folds (r14 review).
    needs_recount = _meta_mutate(path, _fold)
    if needs_recount:
        exact = {
            str(r["pcell"]): r["n"]
            for r in read_live(spark, os.path.join(path, _ROWS))
            .groupBy("pcell").agg(F.count("*").alias("n")).collect()
        }

        def _install(meta: dict) -> tuple:
            # the recount ran OUTSIDE the lock (it is a Spark job, too
            # long to hold a filesystem lock across); a fold landing
            # between its snapshot and this install is at most one
            # batch's counts, absorbed by the estimate's documented
            # upper-bound slack and re-tightened at the next trigger
            meta["cell_occupancy"] = exact
            meta["occupancy_folded_n"] = 0
            meta["occupancy_folded_cells"] = {}
            return meta, False

        _meta_mutate(path, _install)
    return out


def ivfpq_index_staleness(spark: SparkSession, path: str) -> dict:
    """Drift dial: how far the live index has grown past its training
    corpus.  ``added_frac_ppm`` = (live - trained) / trained in ppm;
    rebuild when it crosses the operator's threshold (the frozen
    quantizers were fit to the training distribution)."""
    _heal_crashed_rebuild(spark, path)
    _, _, meta = _load_frozen(path)
    live_n = read_live(spark, os.path.join(path, _ROWS)).count()
    trained_n = meta["trained_n"]
    return {
        "trained_n": trained_n,
        "live_n": live_n,
        # trained_n == 0 can only appear in a hand-written sidecar (build
        # raises on an empty training corpus); report fully stale.
        "added_frac_ppm": (
            max(0, live_n - trained_n) * 1_000_000 // trained_n
            if trained_n
            else (1_000_000 if live_n else 0)
        ),
    }


def ivfpq_index_rebuild_if_stale(
    spark: SparkSession,
    path: str,
    base: DataFrame,
    threshold_ppm: int = 200_000,
) -> bool:
    """Turn the staleness dial into a loop: when ``added_frac_ppm``
    crosses ``threshold_ppm``, retrain the index from ``base`` (the
    caller's CURRENT full corpus, ``(vec_id, q)``) in place, with the
    same build recipe the original index recorded in its meta sidecar.

    The rebuild is a fresh ``build_ivfpq_index`` -- training is
    deterministic (fixed-seed kmeans / PQ), so a rebuilt index is
    bit-identical to one freshly built on the same corpus: that is the
    equivalence ``tests/test_ann_index.py`` pins.  Returns True when a
    rebuild happened.  At 100 TB this is the scheduled maintenance job:
    the threshold trades quantizer drift (recall loss on vectors the
    frozen centroids never saw) against the one-pass retrain cost."""
    import shutil

    stale = ivfpq_index_staleness(spark, path)
    if stale["added_frac_ppm"] < threshold_ppm:
        return False
    _, _, meta = _load_frozen(path)
    # build the replacement BESIDE the live index, then swap: deleting
    # first would destroy the only copy if the retrain fails midway
    # (empty base, transient executor/FS error) -- r10 review finding
    tmp = path.rstrip("/") + ".rebuild"
    shutil.rmtree(tmp, ignore_errors=True)
    build_ivfpq_index(
        base,
        tmp,
        dim=meta["dim"],
        m=meta["m"],
        k_codebook=meta["k_codebook"],
        pq_iters=meta.get("pq_iters", 2),
        cells=meta["cells"],
        cell_iters=meta.get("cell_iters", 2),
        replicas=meta["replicas"],
        n_files=meta.get("n_files", 8),
    )
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    # The swap can RACE a concurrent consumer's _heal_crashed_rebuild
    # (ADVICE r15): in the window between rename(path, old) and
    # rename(tmp, path) a healer sees base-missing + tmp-present and
    # promotes tmp itself, making our second rename ENOENT even though
    # the swap COMPLETED.  Both renames therefore tolerate OSError as
    # long as the live index ends up in place -- the healer winning the
    # promotion race is success, not failure (same idiom as the healer's
    # own replay steps).
    try:
        os.rename(path, old)
    except OSError:
        pass  # already moved by a healer replaying a prior crash
    try:
        os.rename(tmp, path)
    except OSError:
        if not os.path.isdir(path):
            raise  # genuinely failed: no live index anywhere
    # the manifest records absolute file paths; repoint them from the
    # staging prefix to the final location as a proper log commit
    # (file-count-sized rewrite; a cache-only poke would be healed back
    # to the stale prefix from the renamed-along commit log).  Idempotent:
    # if the winning healer already repointed, no file matches the tmp
    # prefix and the rewrite is a no-op.
    repoint_files(spark, os.path.join(path, _ROWS), tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return True


def ivfpq_index_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    vectors: DataFrame,
    nprobe: int = 4,
    prefilter: int | None = None,
    k: int = 5,
    auto_depth_cap: int | None = None,
) -> DataFrame:
    """Serve top-``k`` from the persisted index: route ``queries``
    ``(vec_id, q)`` against the frozen centroids, shortlist by ADC over
    the index's code rows (probed cells only), exact-rerank the
    survivors against ``vectors`` (the caller's full-width base table --
    the index itself never stores full vectors).  Output
    ``(query_id, neighbor_id, d2, rk)``, ties on (d2, id) -- identical
    semantics to ``similarity.ivfpq_topk`` given the same training set.

    ``prefilter=None`` (default) auto-sizes the rerank depth to
    ``max(4*k, 2 * p90(cell occupancy))`` from the occupancy stats the
    build recorded in the meta sidecar (similarity.auto_rerank_depth --
    the fix for the r10 fixed-25 recall footgun).  Both sidecar forms
    are accepted ({cid: count} map and the earlier sorted count list);
    an index without stats pays one <=``cells``-row count over the
    live rows table.  Pass an int to pin it.  ``auto_depth_cap`` bounds
    the auto rule's skew blow-up (a mega-cell drives p90 toward n --
    see auto_rerank_depth); it never cuts below the 4*k floor.
    """
    from .similarity import auto_rerank_depth

    _heal_crashed_rebuild(spark, path)
    cents_rows, cents_lit, meta = _load_frozen(path)
    m, dim = meta["m"], meta["dim"]
    sub_dim = dim // m
    queries = queries.select("vec_id", "q").localCheckpoint(eager=False)

    cents = spark.createDataFrame(
        [(c, v) for c, v in cents_rows], "cid int, c array<bigint>"
    )
    probe_cells = assign_top_cells(
        queries, cents, nprobe, cents_lit=cents_rows
    ).select(F.col("vec_id").alias("query_id"), "cid")
    rows = read_live(spark, os.path.join(path, _ROWS))
    if prefilter is None:
        stored = meta.get("cell_occupancy")
        if isinstance(stored, dict) and stored:
            # {cell id: count} map maintained by build + adds (r11)
            counts = list(stored.values())
        elif isinstance(stored, list) and stored:
            # the first r11 format stored a sorted count LIST (no cell
            # ids) -- usable for the p90 as-is (second-pass review:
            # assuming dict crashed on these)
            counts = list(stored)
        else:  # index without stats: one cells-sized aggregate
            counts = [
                r["n"]
                for r in rows.groupBy("pcell")
                .agg(F.count("*").alias("n"))
                .collect()
            ]
        prefilter = auto_rerank_depth(counts, k, depth_cap=auto_depth_cap)
    cand_cells = rows.select(
        F.col("vec_id").alias("cand_id"), F.explode("cells").alias("cid")
    )
    pairs = (
        probe_cells.join(cand_cells, "cid")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
        .distinct()
    )

    code_rows = rows.select(
        F.col("vec_id").alias("cand_id"),
        "pcell",
        F.posexplode("codes").alias("sub", "cid"),
    )
    books = spark.createDataFrame(
        [(s, c, v) for (s, c), v in sorted(cents_lit.items())],
        "sub int, cid int, c array<bigint>",
    )
    # residual ADC: the lookup table is per-(query, candidate's primary
    # cell), matching the residual the candidate's codes quantized
    tables = residual_adc_tables(queries, cents, books, m, sub_dim)
    adc = (
        pairs.join(code_rows, "cand_id")
        .join(F.broadcast(tables), ["query_id", "pcell", "sub", "cid"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("pd2").cast("long").alias("ad2"))
    )
    wa = Window.partitionBy("query_id").orderBy("ad2", "cand_id")
    shortlist = adc.withColumn("srk", F.row_number().over(wa)).filter(
        F.col("srk") <= prefilter
    )

    exact = (
        shortlist.join(
            queries.select(
                F.col("vec_id").alias("query_id"), F.col("q").alias("_qq")
            ),
            "query_id",
        )
        .join(
            vectors.select(
                F.col("vec_id").alias("cand_id"), F.col("q").alias("_cq")
            ),
            "cand_id",
        )
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            _pq_sqdist(F.col("_qq"), F.col("_cq")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        exact.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def ivfpq_index_stream_add(
    vectors: DataFrame, path: str, checkpoint_dir: str,
    seq_col: str | None = None,
):
    """Keep a persisted index fresh from a STREAM of vector batches:
    ``foreachBatch`` -> :func:`ivfpq_index_add` (the same
    at-least-once + idempotent-MERGE story as streaming/cdc.py --
    replaying a batch re-upserts the same keys, so recovery is safe).
    ``vectors`` is a streaming ``(vec_id, q)`` DataFrame; returns the
    StreamingQuery (caller awaits/stops).

    Like cdc.py's ``latest_per_key``, each micro-batch is collapsed to
    ONE row per ``vec_id`` before the MERGE -- without this, two updates
    to one key drained in the same availableNow batch would BOTH append
    (merge_upsert anti-joins old rows, not rows within the batch),
    leaving duplicate live rows that double that candidate's summed ADC
    distance.  Pass ``seq_col`` to keep the highest-sequence row;
    without one, the deterministic max-``q`` row wins (arrays compare
    lexicographically -- any total order works, it only breaks ties
    between conflicting same-key updates).

    The frozen quantizers are NOT retrained by the stream;
    ``ivfpq_index_staleness`` / ``ivfpq_index_rebuild_if_stale`` remain
    the rebuild dial, typically run between micro-batch windows by a
    maintenance job."""

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        # seq ties fall through to the q order so the survivor is a
        # function of row content on replay (same rule as
        # streaming/cdc.py::latest_per_key); rows equal in BOTH are
        # interchangeable downstream
        order = (
            [F.col(seq_col).desc(), F.col("q").desc()]
            if seq_col
            else [F.col("q").desc()]
        )
        w = Window.partitionBy("vec_id").orderBy(*order)
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "q")
        )
        ivfpq_index_add(batch.sparkSession, path, latest)

    return (
        vectors.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
