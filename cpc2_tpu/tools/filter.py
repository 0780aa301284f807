"""SNR/C50-based dataset filtering (reference `data/filter.py`).

Creates symlink subsets of the top-p% segments by Brouhaha SNR/C50 scores
(criteria: snr, c50, snr_c50, random).

Run: `python -m cpc2_tpu.tools.filter <segments_dir> --table scores.csv`
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path

import pandas as pd


def create_snr_c50_table(segment_dir, pred_dir):
    """(reference `filter.py:25-54`)."""
    segment_dir = Path(segment_dir) / 'no_filter'
    pred_dir = Path(pred_dir)

    snr_df = pd.read_csv(pred_dir / 'mean_snr_labels.txt', sep=" ",
                         header=None, names=['uri', 'snr'])
    c50_df = pd.read_csv(pred_dir / 'reverb_labels.txt', sep=" ",
                         header=None, names=['uri', 'c50'])
    scores_df = pd.merge(snr_df, c50_df, on='uri')
    wav_df = pd.DataFrame({'path': list(segment_dir.glob('**/*.wav'))})
    wav_df['uri'] = wav_df['path'].map(lambda x: x.stem)
    wav_df['subpath'] = wav_df['path'].map(
        lambda x: x.relative_to(segment_dir))

    if len(wav_df) != len(scores_df):
        raise ValueError(f"Number of predictions (= {len(scores_df)}) "
                         f"should be equal to number of wav files "
                         f"(= {len(wav_df)}).")

    scores_df = pd.merge(scores_df, wav_df, on='uri')
    # min-max normalization (sklearn MinMaxScaler equivalent)
    for col, norm_col in (("snr", "snr_normalized"),
                          ("c50", "c50_normalized")):
        mn, mx = scores_df[col].min(), scores_df[col].max()
        scores_df[norm_col] = (scores_df[col] - mn) / max(mx - mn, 1e-12)
    scores_df["snr_c50"] = (scores_df["snr_normalized"]
                            + scores_df["c50_normalized"]) / 2
    scores_df.to_csv(os.path.join(segment_dir,
                                  'brouhaha_snr_c50_scores.csv'),
                     sep=',', index=False)
    return scores_df


def filter_data(table, criterion, percentage):
    """Top percentage by criterion (reference `filter.py:57-65`)."""
    table_sorted = table.sort_values([criterion], ascending=False)
    number_of_data = int(percentage * table.shape[0] / 100)
    return table_sorted[["uri", "path", "subpath"]][:number_of_data]


def randomly_filter_data(table, criterion, percentage):
    """(reference `filter.py:68-72`)."""
    return table.sample(frac=percentage / 100)[["uri", "path", "subpath"]]


def create_symlinks(files, segments_dir, criterion, percentage):
    """(reference `filter.py:75-89`)."""
    segments_dir = Path(segments_dir)
    link_repo = segments_dir / criterion / str(percentage)
    for row in files.iterrows():
        subpath = row[1]['subpath']
        src_path = row[1]['path']
        link_path = link_repo / subpath
        os.makedirs(link_path.parent, exist_ok=True)
        os.symlink(src_path, link_path)


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description='Creates filtered subsets with the top X percents of '
                    'the dataset regarding to the desired criterion '
                    '(snr, c50 or both)')
    parser.add_argument('segments_dir', type=str,
                        help="Path to the audio segments")
    parser.add_argument('-p', '--percentage', type=int, nargs='+',
                        default=[10, 20, 30, 40, 50, 60, 70, 80, 90])
    parser.add_argument('-c', '--criterion', type=str, default="all",
                        choices=["snr", "c50", "snr_c50", "all", "random"])
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument('--create_pred_table', metavar="PREDICTIONS_DIR")
    group.add_argument('--table', type=str)
    parser.add_argument("-v", "--verbose", action="store_true")
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)
    logging.getLogger().setLevel(
        logging.DEBUG if args.verbose else logging.INFO)

    if args.create_pred_table is not None:
        logging.info("Creating the table with snr and c50 scores")
        table = create_snr_c50_table(args.segments_dir,
                                     args.create_pred_table)
    else:
        table = pd.read_csv(args.table)

    if args.criterion == "all":
        logging.info(f"### Creating subsets for {args.percentage} "
                     f"regarding to snr, c50, both and random ###")
        for crit in ["snr", "c50", "snr_c50", "random"]:
            for percentage in args.percentage:
                flt = randomly_filter_data if crit == "random" \
                    else filter_data
                files = flt(table, crit, percentage)
                create_symlinks(files, args.segments_dir, crit, percentage)
                logging.info(f"Subset of the {percentage} percents top of "
                             f"{crit} done.")
    else:
        flt = randomly_filter_data if args.criterion == "random" \
            else filter_data
        for percentage in args.percentage:
            files = flt(table, args.criterion, percentage)
            create_symlinks(files, args.segments_dir, args.criterion,
                            percentage)
            logging.info(f"Subset of the {percentage} percents top of "
                         f"{args.criterion} done.")


if __name__ == "__main__":
    main(sys.argv[1:])
