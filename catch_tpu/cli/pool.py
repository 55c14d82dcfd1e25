#!/usr/bin/env python3
"""Pool probes across datasets by searching for optimal parameters.

Flag-compatible with /root/reference/bin/pool.py:16-140.
"""

import argparse
import logging

from catch_tpu.pool import param_search
from catch_tpu.utils import log, pool_probes_io, version

logger = logging.getLogger(__name__)


def main(args):
    param_names, probe_counts = pool_probes_io.read_table_of_probe_counts(
        args.probe_count_tsv)

    if args.dataset_weights_tsv:
        dataset_weights = pool_probes_io.read_table_of_dataset_weights(
            args.dataset_weights_tsv, probe_counts.keys())
    else:
        dataset_weights = None

    if args.loss_coeffs and len(args.loss_coeffs) != len(param_names):
        raise Exception(
            "If using --loss-coeffs, the number of coefficients (%d) "
            "must be the same as the number of parameters provided in "
            "the input table (%d)" % (len(args.loss_coeffs),
                                      len(param_names)))

    if args.use_nd:
        if args.round_params:
            raise Exception(
                "The arguments '--use-nd' and '--round-params' cannot "
                "both be used; this does not round parameters after "
                "searching over a space with n > 2")
        s_results = param_search.higher_dimensional_search(
            param_names, probe_counts, args.target_probe_count,
            loss_coeffs=args.loss_coeffs,
            dataset_weights=dataset_weights)
        write_type = "float"
    else:
        if param_names != ("mismatches", "cover_extension"):
            raise Exception(
                "For a standard search, the only parameters in the "
                "input table must be, in order: 'mismatches' and "
                "'cover_extension'. Consider using the '--use-nd' "
                "argument to search over additional parameters.")
        s_results = param_search.standard_search(
            probe_counts, args.target_probe_count,
            round_params=args.round_params,
            loss_coeffs=args.loss_coeffs,
            dataset_weights=dataset_weights)
        write_type = "int"

    opt_params, opt_params_count, opt_params_loss = s_results

    pool_probes_io.write_param_values_across_datasets(
        param_names, opt_params, args.param_vals_tsv, type=write_type)

    print("Number of probes: %d" % opt_params_count)
    print("Loss: %f" % opt_params_loss)


def init_and_parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("probe_count_tsv",
        help=("Path to TSV with probe counts for each dataset and "
              "combination of parameters (first column 'dataset', last "
              "'num_probes', intermediary columns are parameters)"))
    parser.add_argument("target_probe_count", type=int,
        help=("Constraint on the total number of probes in the design"))
    parser.add_argument("param_vals_tsv",
        help="Path to output TSV of optimal parameter values")
    parser.add_argument("--round-params", nargs=2, type=int,
        help=("<m> <e>; round mismatches to the nearest multiple of m "
              "and cover_extension to the nearest multiple of e"))
    parser.add_argument("--use-nd", action="store_true",
        help=("Use the n-dimensional interpolation and search (required "
              "for tables with more than 2 parameters; outputs "
              "fractional values)"))
    parser.add_argument("--loss-coeffs", nargs="+", type=float,
        help=("Coefficients on parameters in the loss function, in "
              "table column order (default: 1 for mismatches, 1/100 for "
              "cover_extension; with --use-nd, 1 for all)"))
    parser.add_argument("--dataset-weights", dest="dataset_weights_tsv",
        help=("Path to TSV with a weight for each dataset ('dataset' / "
              "'weight' columns) for the loss function"))
    parser.add_argument("--debug", dest="log_level",
        action="store_const", const=logging.DEBUG,
        default=logging.WARNING, help="Debug output")
    parser.add_argument("--verbose", dest="log_level",
        action="store_const", const=logging.INFO, help="Verbose output")
    parser.add_argument("--version", "-V", action="version",
        version=version.get_version())
    return parser.parse_args(argv)


def run():
    args = init_and_parse_args()
    log.configure_logging(args.log_level)
    main(args)


if __name__ == "__main__":
    run()
