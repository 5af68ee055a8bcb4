"""Dataset preprocessing CLI — parity with the reference root
``dataset_creator.py`` (:28-52): shuffle the .osu corpus, shard it strided
across a multiprocessing pool, per-map exception containment. Audio specs are
published by atomic rename (no per-path lock registry needed)."""

from __future__ import annotations

import random
from argparse import ArgumentParser
from multiprocessing import Pool
from pathlib import Path


def run(worker_id: int, num_workers: int, dataset_dir: Path, osu_files: list) -> int:
    from osufusion_tpu.train.preprocess import prepare_map

    done = 0
    for map_file in osu_files[worker_id::num_workers]:
        try:
            if prepare_map(dataset_dir, map_file):
                done += 1
        except Exception as e:  # noqa: BLE001 — per-map containment
            print(f"Failed to process {map_file}: {e}")
    return done


def main() -> None:
    p = ArgumentParser()
    p.add_argument("--dataset-dir", type=Path, required=True)
    p.add_argument("--osu-song-dir", type=Path, required=True)
    p.add_argument("--num-workers", type=int, default=4)
    args = p.parse_args()

    osu_files = list(args.osu_song_dir.rglob("*.osu"))
    random.shuffle(osu_files)
    print(f"found {len(osu_files)} .osu files")

    if args.num_workers <= 1:
        done = run(0, 1, args.dataset_dir, osu_files)
    else:
        with Pool(args.num_workers) as pool:
            counts = pool.starmap(
                run,
                [(i, args.num_workers, args.dataset_dir, osu_files) for i in range(args.num_workers)],
            )
        done = sum(counts)
    print(f"processed {done}/{len(osu_files)} maps")


if __name__ == "__main__":
    main()
