import sys

from geomesa_ray.cli import main

sys.exit(main())
