"""curation_shards end-to-end: the resumable training-data export —
manifest stability across reruns, kill-resume (a lost shard is
rewritten, committed shards are skipped untouched), and read-back
equality with the curation survivor set."""

import glob
import os
import shutil


_SF = "/root/testdata/sf0.001"


def _manifest_map(t):
    return dict(
        zip(t.column("shard").to_pylist(), t.column("n_docs").to_pylist())
    )


def test_curation_shards_kill_resume(ray_session, monkeypatch, tmp_path):
    from signal_collect_ray.pipelines import queries as qmod
    from signal_collect_ray.sinks import read_partitioned

    monkeypatch.setattr(
        qmod,
        "_work_dir",
        lambda sf, name, _t=str(tmp_path): os.path.join(_t, name),
    )

    m1 = qmod.q_curation_shards(_SF)
    out_dirs = glob.glob(os.path.join(str(tmp_path), "curation_shards_*"))
    assert len(out_dirs) == 1
    out = out_dirs[0]

    # every written shard committed atomically with a marker
    parts = sorted(glob.glob(os.path.join(out, "part=*")))
    assert len(parts) == m1.num_rows
    for p in parts:
        assert os.path.exists(os.path.join(p, "_SUCCESS"))

    # manifest totals == the curation survivor set
    curated_ids = sorted(
        r["doc_id"] for r in qmod.q_corpus_curation(_SF).take_all()
    )
    assert sum(_manifest_map(m1).values()) == len(curated_ids)

    # rerun = pure resume: identical manifest, no shard rewritten
    # (mtimes untouched)
    mtimes = {p: os.path.getmtime(os.path.join(p, "data.parquet"))
              for p in parts}
    m2 = qmod.q_curation_shards(_SF)
    assert _manifest_map(m2) == _manifest_map(m1)
    for p in parts:
        assert os.path.getmtime(os.path.join(p, "data.parquet")) == mtimes[p]

    # kill-resume: lose one whole shard directory mid-"job"; the rerun
    # rewrites exactly that shard and the manifest is unchanged
    victim = parts[len(parts) // 2]
    shutil.rmtree(victim)
    m3 = qmod.q_curation_shards(_SF)
    assert _manifest_map(m3) == _manifest_map(m1)
    assert os.path.exists(os.path.join(victim, "_SUCCESS"))
    untouched = [p for p in parts if p != victim]
    for p in untouched:
        assert os.path.getmtime(os.path.join(p, "data.parquet")) == mtimes[p]

    # read-back: the shard tree IS the curated corpus, every doc
    # exactly once
    back = sorted(
        r["doc_id"] for r in read_partitioned(out).take_all()
    )
    assert back == curated_ids
