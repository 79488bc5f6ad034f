from .allegro import AllegroHandRight, AllegroHandRightTouch
