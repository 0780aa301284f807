"""SNR/C50-based dataset filtering.

Behavioral spec (reference ``data/filter.py``): given Brouhaha per-segment
SNR and C50 predictions, build a joint score table over the wav segments in
``<segments_dir>/no_filter``, then materialize the top-p% subsets (by snr,
c50, their normalized mean, or a random draw) as symlink trees under
``<segments_dir>/<criterion>/<percentage>/``.

Run: ``python -m cpc2_tpu.tools.filter <segments_dir> --table scores.csv``
or ``--create_pred_table <brouhaha_predictions_dir>``.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import pandas as pd

RAW_SUBSET = 'no_filter'
TABLE_NAME = 'brouhaha_snr_c50_scores.csv'
CRITERIA = ('snr', 'c50', 'snr_c50', 'random')


def _read_brouhaha_scores(pred_dir: Path) -> pd.DataFrame:
    """One row per uri with raw `snr` and `c50` columns.

    Brouhaha emits two space-separated two-column files:
    ``mean_snr_labels.txt`` and ``reverb_labels.txt``.
    """
    def one(fname, value_col):
        return pd.read_csv(pred_dir / fname, sep=' ', header=None,
                           names=['uri', value_col])

    return one('mean_snr_labels.txt', 'snr').merge(
        one('reverb_labels.txt', 'c50'), on='uri')


def _index_wavs(raw_dir: Path) -> pd.DataFrame:
    """One row per segment wav: uri (stem), absolute path, and the path
    relative to the raw subset root (preserved in the symlink trees)."""
    records = [{'uri': p.stem, 'path': p, 'subpath': p.relative_to(raw_dir)}
               for p in sorted(raw_dir.glob('**/*.wav'))]
    return pd.DataFrame.from_records(records,
                                     columns=['uri', 'path', 'subpath'])


def _unit_scale(values: pd.Series) -> pd.Series:
    """Min-max rescale to [0, 1] (constant input maps to 0)."""
    lo, hi = values.min(), values.max()
    span = hi - lo
    if span <= 0:
        span = 1e-12
    return (values - lo) / span


def create_snr_c50_table(segment_dir, pred_dir) -> pd.DataFrame:
    """Join Brouhaha scores with the on-disk segments and add normalized
    columns; persists the table as CSV next to the raw segments."""
    raw_dir = Path(segment_dir) / RAW_SUBSET
    scores = _read_brouhaha_scores(Path(pred_dir))
    wavs = _index_wavs(raw_dir)
    if len(wavs) != len(scores):
        raise ValueError(
            f"Number of predictions (= {len(scores)}) should be equal to "
            f"number of wav files (= {len(wavs)}).")

    table = scores.merge(wavs, on='uri')
    table['snr_normalized'] = _unit_scale(table['snr'])
    table['c50_normalized'] = _unit_scale(table['c50'])
    table['snr_c50'] = (table['snr_normalized'] + table['c50_normalized']) / 2
    table.to_csv(raw_dir / TABLE_NAME, sep=',', index=False)
    return table


def filter_data(table: pd.DataFrame, criterion: str,
                percentage: int) -> pd.DataFrame:
    """The top ``percentage``% rows ranked by ``criterion`` (descending)."""
    keep = int(len(table) * percentage / 100)
    ranked = table.sort_values(criterion, ascending=False)
    return ranked.head(keep)[['uri', 'path', 'subpath']]


def randomly_filter_data(table: pd.DataFrame, criterion: str,
                         percentage: int) -> pd.DataFrame:
    """A uniform random ``percentage``% of the rows (criterion unused)."""
    del criterion
    return table.sample(frac=percentage / 100)[['uri', 'path', 'subpath']]


def create_symlinks(files: pd.DataFrame, segments_dir, criterion: str,
                    percentage: int) -> None:
    """Mirror the selected segments as symlinks under
    ``<segments_dir>/<criterion>/<percentage>/<subpath>``."""
    subset_root = Path(segments_dir) / criterion / str(percentage)
    for rec in files.itertuples(index=False):
        link = subset_root / rec.subpath
        link.parent.mkdir(parents=True, exist_ok=True)
        link.symlink_to(rec.path)


def _selector(criterion: str):
    return randomly_filter_data if criterion == 'random' else filter_data


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

    criteria = CRITERIA if args.criterion == 'all' else (args.criterion,)
    if args.criterion == 'all':
        logging.info(f"### Creating subsets for {args.percentage} "
                     f"regarding to snr, c50, both and random ###")
    for criterion in criteria:
        select = _selector(criterion)
        for percentage in args.percentage:
            create_symlinks(select(table, criterion, percentage),
                            args.segments_dir, criterion, percentage)
            logging.info(f"Subset of the {percentage} percents top of "
                         f"{criterion} done.")


if __name__ == "__main__":
    main(sys.argv[1:])
