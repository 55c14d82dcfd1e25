"""TSV I/O for the pool optimizer.

Parity: /root/reference/catch/utils/pool_probes_io.py:11-148 — probe
count tables (first column 'dataset', last 'num_probes', middle columns
are parameters), dataset weight tables, and the per-dataset parameter
value writer.
"""

import logging

logger = logging.getLogger(__name__)

__all__ = ["read_table_of_probe_counts", "read_table_of_dataset_weights",
           "write_param_values_across_datasets"]


def read_table_of_probe_counts(fn):
    """Read a probe-count TSV.

    Returns:
        (param_names tuple, {dataset: {param_values tuple: count}})
    """
    d = {}
    param_names = None
    with open(fn) as f:
        for i, line in enumerate(f):
            ls = line.rstrip().split("\t")
            if i == 0:
                header = ls
                if header[0] != "dataset":
                    raise Exception("First column in probe count table "
                                    "must be 'dataset'")
                if header[-1] != "num_probes":
                    raise Exception("Last column in probe count table "
                                    "must be 'num_probes'")
                param_names = tuple(ls[1:-1])
                continue
            assert len(ls) == 2 + len(param_names)
            dataset = ls[0]
            num_probes = int(ls[-1])
            param_values = tuple(float(x) for x in ls[1:-1])
            if dataset not in d:
                d[dataset] = {}
            if param_values in d[dataset]:
                raise Exception(
                    "The same combination of dataset and parameters is "
                    "listed more than once in the probe count table")
            d[dataset][param_values] = num_probes
    return (param_names, d)


def read_table_of_dataset_weights(fn, datasets_to_check=None):
    """Read a dataset-weights TSV ('dataset' / 'weight' columns).

    Returns:
        {dataset: weight}
    """
    d = {}
    with open(fn) as f:
        for i, line in enumerate(f):
            ls = line.rstrip().split("\t")
            if i == 0:
                header = ls
                if header[0] != "dataset":
                    raise Exception("First column in dataset weights "
                                    "table must be 'dataset'")
                if header[1] != "weight":
                    raise Exception("Second column in dataset weights "
                                    "table must be 'weight'")
                if len(header) > 2:
                    raise Exception("There can only be two columns in "
                                    "the dataset weights table")
                continue
            assert len(ls) == 2
            dataset = ls[0]
            weight = float(ls[1])
            if dataset in d:
                raise Exception(
                    "The same dataset (%s) appears on more than one row "
                    "in the dataset weights table" % dataset)
            d[dataset] = weight

    if datasets_to_check is not None:
        for dataset in datasets_to_check:
            if dataset not in d:
                raise Exception(
                    "dataset %s needs a weight, but one is not given in "
                    "the dataset weights table" % dataset)
    return d


def write_param_values_across_datasets(param_names, param_vals, out_tsv,
                                       type="int"):
    """Write per-dataset parameter values as a TSV."""
    header = "\t".join(["dataset"] + list(param_names))
    lines = [header]
    for dataset in sorted(param_vals.keys()):
        vals = param_vals[dataset]
        if type == "float":
            line = "\t".join([dataset] + ["%f" % p for p in vals])
        elif type == "int":
            line = "\t".join([dataset] + ["%d" % p for p in vals])
        else:
            raise ValueError("Unknown type %s", type)
        lines.append(line)
    with open(out_tsv, "w") as f:
        for line in lines:
            f.write(line + "\n")
