# Submodules (fast, harris, orientation, brief, orb) are imported lazily by
# consumers to keep import costs low and avoid heavyweight table building at
# package import time.
