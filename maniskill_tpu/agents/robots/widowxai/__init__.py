from .widowxai import WidowXAI
