"""``python -m fairmultimodal_tpu.cli`` entry point."""

import sys

from fairmultimodal_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
