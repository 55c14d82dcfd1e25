#!/usr/bin/env python3
"""Design probes with defaults for large, highly diverse input.

Thin wrapper around the design program with args_type='large'
(parity: /root/reference/bin/design_large.py:19-21).
"""

from catch_tpu.cli import design


def run():
    design.main(design.init_and_parse_args(args_type="large"))


if __name__ == "__main__":
    run()
