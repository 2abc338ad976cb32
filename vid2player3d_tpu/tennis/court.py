"""Tennis court geometry constants.

Singles court, net at y=0, this player's side is y>0 and the opponent's
bounce target is the far half. Values as used by the reference
(`physics_mvae_controller.py:285-288`, `tennis_ball.py:21`).
"""

NET_HEIGHT = 1.07      # m at the posts (reference tennis_ball.py:21)
HALF_WIDTH = 4.11      # singles half width
HALF_LENGTH = 11.89    # baseline distance from net
SERVICE_LINE = 6.4     # service box depth from net

# far-half bounce-in box in this player's frame (reference :285-288)
COURT_MIN = (-HALF_WIDTH, 0.0)
COURT_MAX = (HALF_WIDTH, HALF_LENGTH)
SERVE_MAX = (HALF_WIDTH, SERVICE_LINE)
