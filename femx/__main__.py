import sys

from femx.cli import main

sys.exit(main())
